"""MINE statistics network T(x, z) (reference: mine.py:5-18).

3-layer MLP with ELU activations: input -> hidden -> hidden -> 1. The default
input is a concatenation of two 2048-d representations (reference:
training_others/train_mine.py:16-19, input_size = 2 * feature_dim).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class MineNet(nn.Module):
    hidden_size: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(x)
        x = nn.elu(x)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(x)
        x = nn.elu(x)
        return nn.Dense(1, dtype=self.dtype, name="out")(x)
