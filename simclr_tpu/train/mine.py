"""MINE mutual-information estimation over learned representations.

Counterpart of reference mine.py:21-171 + training_others/train_mine.py: a
MineNet MLP trained with the Donsker-Varadhan bound (EMA-debiased gradient)
on (joint, marginal) feature pairs produced by a FROZEN pretrained SimCLR
model.

Sampler parity:
  * `repr` mode (sample_joint_marginal, mine.py:21-56): joint = [f(aug1(x)),
    f(aug2(x))], marginal = [f(aug1(x)), f(aug(x'))] for an independently
    drawn x'; h or z features.
  * `orig` mode (sample_joint_marginal_with_orig, mine.py:59-94): joint =
    [flatten(aug(x)), f(aug(x))], marginal pairs the image with an
    independent sample's representation.

TPU-native: everything (augmentation, frozen encoder forwards, MineNet
update) is ONE jitted step scanned over per-iteration index blocks; data is
drawn from infinite on-device streams instead of the reference's
rebuild-the-DataLoader-every-iteration pathology (mine.py:38-39, SURVEY.md
§3.4).

Numerical note: the DV bound is computed in log space
(ops.losses.mine_loss) so exp(T) cannot overflow — the reference's linear
formulation NaNs once T exceeds ~88. The bound itself is still unbounded
above: when the two variables are near-deterministically coupled (e.g.
highly structured synthetic data where "marginal" pairs are often
same-class near-duplicates), T legitimately diverges — a known property of
MINE, not an implementation artifact.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simclr_tpu.config import Config
from simclr_tpu.data.pipeline import DeviceDataset
from simclr_tpu.models.mine import MineNet
from simclr_tpu.models.simclr import SimCLR
from simclr_tpu.ops.augment import augment_train, augment_train_pair
from simclr_tpu.ops.losses import mine_loss
from simclr_tpu.train.common import TrainState, adam_torch
from simclr_tpu.utils.checkpoint import load_exported_model


@dataclasses.dataclass
class MineResult:
    state: TrainState
    loss_trace: np.ndarray      # smoothed every `take_avg_every`
    mi_trace: np.ndarray
    final_mi: float


def train_mine(
    cfg: Config,
    dataset: DeviceDataset,
    simclr_params,
    simclr_batch_stats,
    n_iter: int = 1000,
    ma_rate: float = 5e-2,
    mi_between_repr: bool = True,
    use_hidden_feat: bool = True,
    batch_size: Optional[int] = None,
    hidden_size: Optional[int] = None,
    lr: Optional[float] = None,
    log: Callable[[str], None] = print,
    print_every: int = 50,
    take_avg_every: int = 50,
) -> MineResult:
    """Train the MI estimator (reference: mine.py:112-171)."""
    batch = batch_size or cfg.train.mine_batch_size
    hidden = hidden_size or cfg.train.mine_hidden_dim
    ds_cfg, aug_cfg = cfg.dataset, cfg.augment

    simclr = SimCLR(cfg=cfg.model)
    frozen = {"params": simclr_params, "batch_stats": simclr_batch_stats}

    feat_dim = cfg.model.feature_dim if use_hidden_feat \
        else cfg.model.compressed_dim
    if mi_between_repr:
        input_size = 2 * feat_dim
    else:
        input_size = ds_cfg.img_size ** 2 * 3 + feat_dim

    mine = MineNet(hidden_size=hidden)
    key = jax.random.key(cfg.train.seed)
    k_init, k_loop = jax.random.split(key)
    variables = mine.init(k_init, jnp.zeros((2, input_size), jnp.float32))
    tx = adam_torch(lr or cfg.optim.mine_lr)
    state = TrainState.create(variables["params"], {}, tx)

    # `frozen` (94 MB of encoder weights) is threaded as a jit ARGUMENT —
    # closure capture would bake it into the compiled executable as a
    # constant (bloated compile payloads, recompile per checkpoint).
    def encode(frozen, x, k):
        h, z = simclr.apply(frozen, x, train=False, rngs={"dropout": k})
        return h if use_hidden_feat else z

    def sample(frozen, images, idx_joint, idx_marginal, k):
        k_a, k_b, k_d1, k_d2, k_d3 = jax.random.split(k, 5)
        x_joint = jnp.take(images, idx_joint, axis=0)
        x_marg = jnp.take(images, idx_marginal, axis=0)
        if mi_between_repr:
            v1, v2 = augment_train_pair(k_a, x_joint, aug_cfg, ds_cfg)
            vm = augment_train(k_b, x_marg, aug_cfg, ds_cfg)
            f1, f2, fm = (encode(frozen, v1, k_d1),
                          encode(frozen, v2, k_d2),
                          encode(frozen, vm, k_d3))
            joint = jnp.concatenate([f1, f2], axis=1)
            marginal = jnp.concatenate([f1, fm], axis=1)
        else:
            v = augment_train(k_a, x_joint, aug_cfg, ds_cfg)
            vm = augment_train(k_b, x_marg, aug_cfg, ds_cfg)
            flat = v.reshape(v.shape[0], -1)
            joint = jnp.concatenate(
                [flat, encode(frozen, v, k_d1)], axis=1)
            marginal = jnp.concatenate(
                [flat, encode(frozen, vm, k_d2)], axis=1)
        return joint, marginal

    def make_mine_step(frozen, images):
        def mine_step(carry, xs):
            state, log_ma = carry
            idx_j, idx_m, k = xs
            joint, marginal = sample(frozen, images, idx_j, idx_m, k)

            def objective(params):
                t_j = mine.apply({"params": params}, joint)
                t_m = mine.apply({"params": params}, marginal)
                loss, mi, new_ma = mine_loss(t_j, t_m, log_ma, ma_rate)
                return loss, (mi, new_ma)

            (loss, (mi, new_ma)), grads = jax.value_and_grad(
                objective, has_aux=True)(state.params)
            updates, new_opt = tx.update(
                grads, state.opt_state, state.params)
            new_params = jax.tree.map(
                lambda p, u: p + u.astype(p.dtype), state.params, updates)
            new_state = state.replace(
                params=new_params, opt_state=new_opt, step=state.step + 1)
            return (new_state, new_ma), (loss, mi)

        return mine_step

    @partial(jax.jit, donate_argnums=0)
    def run_chunk(carry, frozen_args, images, idx_j, idx_m, keys):
        return jax.lax.scan(make_mine_step(frozen_args, images), carry,
                            (idx_j, idx_m, keys))

    # EMA state must be an array inside scan; initialize it with the true
    # first-step semantics (last_ma=None -> ma = mean(et), carried as
    # log_ma, see ops.losses.mine_loss) by evaluating T once eagerly.
    from simclr_tpu.ops.losses import log_mean_exp

    k0 = jax.random.fold_in(k_loop, 0)
    k_j0, k_m0, k_s0 = jax.random.split(k0, 3)
    idx_j0 = jax.random.randint(k_j0, (batch,), 0, dataset.n)
    idx_m0 = jax.random.randint(k_m0, (batch,), 0, dataset.n)
    joint0, marg0 = jax.jit(sample)(
        frozen, dataset.images, idx_j0, idx_m0, k_s0)
    t_m0 = mine.apply({"params": state.params}, marg0)
    log_ma = log_mean_exp(t_m0)

    losses_all, mis_all = [], []
    carry = (state, log_ma)
    chunk = take_avg_every
    n_chunks = max(n_iter // chunk, 1)
    for c in range(n_chunks):
        k_c = jax.random.fold_in(k_loop, c + 1)
        k_j, k_m, k_s = jax.random.split(k_c, 3)
        idx_j = jax.random.randint(k_j, (chunk, batch), 0, dataset.n)
        idx_m = jax.random.randint(k_m, (chunk, batch), 0, dataset.n)
        keys = jax.random.split(k_s, chunk)
        carry, (losses, mis) = run_chunk(
            carry, frozen, dataset.images, idx_j, idx_m, keys)
        losses, mis = np.asarray(losses), np.asarray(mis)
        losses_all.append(losses.mean())
        mis_all.append(mis.mean())
        it = (c + 1) * chunk
        if it % print_every == 0:
            log(f"iteration #{it}: loss: {losses[-1]:.4f} | "
                f"MI: {mis[-1]:.4f}")

    state, _ = carry
    return MineResult(
        state=state,
        loss_trace=np.asarray(losses_all),
        mi_trace=np.asarray(mis_all),
        final_mi=float(mis_all[-1]),
    )


def train_mine_from_export(
    cfg: Config, dataset: DeviceDataset, export_path: str, **kw
) -> MineResult:
    """CLI-facing wrapper: load the frozen SimCLR artifact
    (reference: train_mine.py:67 loads the TorchScript trace)."""
    params, batch_stats, _ = load_exported_model(export_path)
    return train_mine(cfg, dataset, params, batch_stats, **kw)
