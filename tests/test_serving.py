"""jax.export serving-artifact roundtrip tests."""

import jax
import jax.numpy as jnp
import numpy as np

from simclr_tpu.config import ModelConfig
from simclr_tpu.models.simclr import SimCLR
from simclr_tpu.utils.serving import export_forward, load_forward

TINY = ModelConfig(feature_dim=64, compressed_dim=16,
                   stage_sizes=(1, 1, 1, 1), width=2)


def test_export_roundtrip(tmp_path):
    model = SimCLR(cfg=TINY)
    x = jnp.zeros((4, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    h_ref, z_ref = model.apply(variables, x, train=False)

    path = str(tmp_path / "simclr.stablehlo")
    export_forward(path, model, variables["params"],
                   variables["batch_stats"], (4, 32, 32, 3))
    fn = load_forward(path)
    h, z = fn(x)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-5)


def test_exported_artifact_is_self_contained(tmp_path):
    """The restored callable works on fresh inputs without the model."""
    model = SimCLR(cfg=TINY)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(1)}, x, train=False)
    path = str(tmp_path / "m.stablehlo")
    export_forward(path, model, variables["params"],
                   variables["batch_stats"], (2, 32, 32, 3))
    fn = load_forward(path)
    rng = np.random.RandomState(0)
    out = fn(jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32)))
    assert out[0].shape == (2, 64) and out[1].shape == (2, 16)
    assert np.isfinite(np.asarray(out[0])).all()
