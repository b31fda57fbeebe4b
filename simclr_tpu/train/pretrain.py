"""SimCLR pretraining engine.

TPU-native counterpart of reference utils/model_utils.py:41-173
(train_simclr) + :12-38 (test_auxi_classification) driven by pretrain.py.
Architecture (not a port):

  * The ENTIRE epoch is one jitted `lax.scan` over an on-device index
    matrix: each scan step fuses batch gather -> two-view augmentation ->
    encoder/projection forward -> NT-Xent -> backward -> Adam update. After
    startup the host only dispatches one call per epoch; there are no
    per-batch host->device copies (the reference pays one per micro-batch,
    model_utils.py:111-112, plus PIL augmentation in worker processes).
  * Two views are augmented and concatenated into a single 2N forward pass
    (better MXU utilization; also how the original SimCLR TF implementation
    batches views). `two_pass_views=True` reproduces the reference's two
    sequential forwards with per-view BN statistics
    (model_utils.py:113-114) for parity experiments.
  * Under a data mesh the batch is sharded; XLA all-gathers the 128-d
    embeddings for the global 2Nx2N similarity — true large-batch negatives
    replacing gradient accumulation (kept available via accum_steps for
    parity, model_utils.py:116-123).
  * Determinism: one JAX PRNG key threads epoch -> step -> view -> op
    randomness; no global seeds.

Checkpoint/resume parity: resumable Orbax checkpoints with epoch, optimizer
state and metric history every `save_ckpt_every` epochs
(model_utils.py:141-154), and a final msgpack inference artifact
(model_utils.py:165-173's TorchScript analogue).
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simclr_tpu.config import Config
from simclr_tpu.data.pipeline import (
    Split, epoch_permutation, make_split)
from simclr_tpu.models.simclr import SimCLR
from simclr_tpu.ops.augment import augment_train_pair
from simclr_tpu.ops.losses import modified_contrastive_loss, nt_xent_loss
from simclr_tpu.parallel.mesh import put_replicated, shard_batch
from simclr_tpu.train.common import (
    History, TrainState, adam_torch, with_grad_accumulation)
from simclr_tpu.utils import checkpoint as ckpt_lib


def _compiler_options() -> Optional[dict]:
    """Backend compiler overrides for the engine's jitted entry points.

    Read from SIMCLR_TPU_COMPILER_OPTIONS (a JSON object, e.g.
    '{"xla_tpu_scoped_vmem_limit_kib": "65536"}'). XLA_FLAGS cannot carry
    TPU backend flags here — the TPU compiler runs behind the axon tunnel
    and only jit(compiler_options=...) ships per-compile overrides to it
    (scripts/flag_sweep.py measures candidates)."""
    s = os.environ.get("SIMCLR_TPU_COMPILER_OPTIONS", "")
    if not s:
        return None
    import json
    return dict(json.loads(s))


@dataclasses.dataclass
class PretrainEngine:
    """Compiled epoch-granular train/eval functions plus bookkeeping."""

    cfg: Config
    model: SimCLR
    tx: Any
    train_epoch: Callable  # (state, images, idx_mat, key) -> (state, metrics)
    eval_epoch: Callable   # (state, images, idx_mat, key) -> metrics
    # Single-step variant taking a device batch directly — the hot function
    # of the host-streaming path (train/streaming.py).
    train_step_direct: Callable = None  # (state, batch_u8, key) -> ...
    mesh: Any = None


def contrastive_fn(cfg: Config, mesh=None, use_pallas=None):
    """Loss selector (reference: utils/model_utils.py:90-98).

    On a single TPU chip with tile-compatible shapes the fused Pallas
    NT-Xent kernel is used (1.7x faster backward than the XLA lowering);
    under a mesh the XLA path stays so the batch-sharded similarity gets
    partitioned + all-gathered by the compiler.
    """
    if cfg.train.modified_loss:
        return lambda z1, z2: modified_contrastive_loss(
            z1, z2, cfg.train.temperature)
    if use_pallas is None:
        from simclr_tpu.ops.pallas.ntxent import supports

        use_pallas = (
            mesh is None
            and supports(cfg.train.batch_size, cfg.model.compressed_dim)
            and jax.default_backend() == "tpu"
        )
    if use_pallas:
        from simclr_tpu.ops.pallas.ntxent import nt_xent_loss_pallas

        return lambda z1, z2: nt_xent_loss_pallas(
            z1, z2, cfg.train.temperature, normalize=True)
    return lambda z1, z2: nt_xent_loss(
        z1, z2, cfg.train.temperature, normalize=True)


def init_simclr(cfg: Config, key: jax.Array,
                mesh=None) -> Tuple[SimCLR, TrainState, Any]:
    model_cfg = cfg.model
    if mesh is not None and mesh.size > 1 and \
            model_cfg.bn_stats_fraction < 1.0:
        # Subset-stat BN slices the leading rows of the GLOBAL batch, which
        # under pjit means gathering shard-0 rows across chips. Sharded
        # full-batch reductions are cheap (1/D of the data per chip), so
        # use exact statistics on meshes.
        model_cfg = dataclasses.replace(model_cfg, bn_stats_fraction=1.0)
    if model_cfg.fuse_identity_blocks is None:
        # Auto: measured on v5e (scripts/profile_step.py) the fully-fused
        # Pallas path is a regression (6.66 vs 8.18 steps/sec — layer1/2
        # tiles are too small for the MXU), so auto resolves to off until
        # a per-stage win is demonstrated; opt in via config.
        model_cfg = dataclasses.replace(
            model_cfg, fuse_identity_blocks=False)
    if model_cfg.fold_bn_scales is None:
        model_cfg = dataclasses.replace(model_cfg, fold_bn_scales=False)
    if model_cfg.bn_relu_fused is None:
        # Auto: off until a measured win — the first (reshape-based)
        # Pallas backward benched 4.81 vs 8.77 steps/s because the
        # C-minor 2D views forced physical transposes of every
        # {3,0,2,1}-laid-out activation around the kernel. The
        # layout-native variants are benchable via bench_variants
        # bnrelu/bnrelu_xla.
        model_cfg = dataclasses.replace(model_cfg, bn_relu_fused=False)
    model = SimCLR(cfg=model_cfg)
    fake = jnp.zeros(
        (2, cfg.dataset.img_size, cfg.dataset.img_size, 3), jnp.float32)
    k_p, k_d = jax.random.split(key)
    variables = model.init(
        {"params": k_p, "dropout": k_d}, fake, train=False)
    tx = with_grad_accumulation(
        adam_torch(cfg.optim.lr, cfg.optim.wt_decay),
        cfg.train.accum_steps)
    state = TrainState.create(
        variables["params"], variables["batch_stats"], tx)
    if mesh is not None:
        state = put_replicated(state, mesh)
    return model, state, tx


def _forward_pair(model, params, batch_stats, v1, v2, drop_key,
                  train, two_pass):
    """Forward both views; returns (z1, z2, new_batch_stats)."""
    variables = {"params": params, "batch_stats": batch_stats}
    rngs = {"dropout": drop_key}
    if two_pass:
        # Reference semantics: sequential forwards, each with its own BN
        # batch statistics (model_utils.py:113-114).
        (_, z1), up1 = model.apply(
            variables, v1, train=train, mutable=["batch_stats"], rngs=rngs)
        variables = {"params": params, "batch_stats": up1["batch_stats"]}
        (_, z2), up2 = model.apply(
            variables, v2, train=train, mutable=["batch_stats"], rngs=rngs)
        return z1, z2, up2["batch_stats"]
    x = jnp.concatenate([v1, v2], axis=0)
    (_, z), up = model.apply(
        variables, x, train=train, mutable=["batch_stats"], rngs=rngs)
    z1, z2 = jnp.split(z, 2, axis=0)
    return z1, z2, up["batch_stats"]


def build_engine(cfg: Config, model: SimCLR, tx,
                 mesh=None, two_pass_views: bool = False,
                 use_pallas_ntxent=None) -> PretrainEngine:
    aug, ds_cfg = cfg.augment, cfg.dataset
    loss_fn = contrastive_fn(cfg, mesh, use_pallas_ntxent)
    accum = max(cfg.train.accum_steps, 1)

    def train_step_on_batch(state: TrainState, batch, key):
        k_aug, k_drop = jax.random.split(key)
        v1, v2 = augment_train_pair(k_aug, batch, aug, ds_cfg)
        v1, v2 = shard_batch(v1, mesh), shard_batch(v2, mesh)

        def objective(params):
            z1, z2, new_stats = _forward_pair(
                model, params, state.batch_stats, v1, v2, k_drop,
                train=True, two_pass=two_pass_views)
            loss, acc = loss_fn(z1, z2)
            return loss, (acc, new_stats)

        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            objective, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(
            lambda p, u: p + u.astype(p.dtype), state.params, updates)
        new_state = state.replace(
            params=new_params, batch_stats=new_stats,
            opt_state=new_opt, step=state.step + 1)
        # History-parity: the reference logs loss / accum_steps
        # (model_utils.py:116-117).
        return new_state, (loss / accum, acc)

    def train_step(state: TrainState, images, idx, key):
        return train_step_on_batch(
            state, jnp.take(images, idx, axis=0), key)

    def eval_step(state: TrainState, images, idx, key):
        # test_auxi_classification parity (model_utils.py:12-38): eval-mode
        # forwards over augmented validation pairs; loss / accum_steps.
        k_aug, k_drop = jax.random.split(key)
        batch = jnp.take(images, idx, axis=0)
        v1, v2 = augment_train_pair(k_aug, batch, aug, ds_cfg)
        v1, v2 = shard_batch(v1, mesh), shard_batch(v2, mesh)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        rngs = {"dropout": k_drop}
        _, z1 = model.apply(variables, v1, train=False, rngs=rngs)
        _, z2 = model.apply(variables, v2, train=False, rngs=rngs)
        loss, acc = loss_fn(z1, z2)
        return loss / accum, acc

    @partial(jax.jit, donate_argnums=0,
             compiler_options=_compiler_options())
    def train_epoch(state, images, idx_mat, key):
        keys = jax.random.split(key, idx_mat.shape[0])

        def body(carry, xs):
            idx, k = xs
            new_carry, metrics = train_step(carry, images, idx, k)
            return new_carry, metrics

        return jax.lax.scan(body, state, (idx_mat, keys))

    @jax.jit
    def eval_epoch(state, images, idx_mat, key):
        keys = jax.random.split(key, idx_mat.shape[0])

        def body(_, xs):
            idx, k = xs
            return None, eval_step(state, images, idx, k)

        _, (losses, accs) = jax.lax.scan(body, None, (idx_mat, keys))
        return jnp.mean(losses), jnp.mean(accs)

    return PretrainEngine(
        cfg=cfg, model=model, tx=tx,
        train_epoch=train_epoch, eval_epoch=eval_epoch,
        train_step_direct=jax.jit(train_step_on_batch, donate_argnums=0),
        mesh=mesh)


def evaluate_auxiliary(
    engine: PretrainEngine,
    state: TrainState,
    ds,
    batch_size: Optional[int] = None,
    seed: int = 0,
) -> Tuple[float, float]:
    """Auxiliary-task (positive-pair retrieval) evaluation over a dataset —
    the reference's test-set variant builds a paired train-augmented test
    loader for exactly this (reference: data.py:241-268
    get_test_cifar_auxiliary_task + utils/model_utils.py:12-38).

    Returns (mean loss / accum_steps, mean top-1 %).
    """
    batch = batch_size or engine.cfg.train.batch_size
    key = jax.random.key(seed)
    idx_mat = epoch_permutation(key, ds.n, batch)
    loss, acc = engine.eval_epoch(state, ds.images, idx_mat, key)
    return float(loss), float(acc)


@dataclasses.dataclass
class PretrainResult:
    state: TrainState
    history: History
    export_path: Optional[str]
    steps_per_sec: float
    # Median per-epoch rate EXCLUDING the first (compile-dominated)
    # epoch; equals steps_per_sec when only one epoch ran.
    steady_steps_per_sec: float = 0.0


def pretrain(
    cfg: Config,
    split: Optional[Split] = None,
    mesh=None,
    resume_from: Optional[str] = None,
    two_pass_views: bool = False,
    log: Callable[[str], None] = print,
    save_checkpoints: Optional[bool] = None,
    export_path: Optional[str] = None,
    metrics_path: Optional[str] = None,
    profile_dir: Optional[str] = None,
    save_plots: bool = True,
    engine: str = "pjit",
    init_variables: Optional[dict] = None,
) -> PretrainResult:
    """Full pretraining driver (reference: pretrain.py:56-94 +
    utils/model_utils.py:41-173). ``engine`` selects the collective
    strategy: 'pjit' (sharding constraints, XLA-inserted collectives — the
    default) or 'explicit' (parallel/explicit.py shard_map with hand-placed
    all_gather/pmean/psum; requires a mesh). ``init_variables`` optionally
    seeds the initial {'params', 'batch_stats'} trees — e.g. a reference
    torch checkpoint ported via utils.torch_port — instead of the random
    init (shapes must match; tree structure is validated by the replace)."""
    tcfg = cfg.train
    root_key = jax.random.key(tcfg.seed)
    k_init, k_data = jax.random.split(jax.random.fold_in(root_key, 0))

    if split is None:
        split = make_split(cfg, "pretrain")
    if engine == "explicit":
        from simclr_tpu.parallel.explicit import (
            build_explicit_engine, init_explicit)

        if mesh is None:
            raise ValueError("engine='explicit' requires a device mesh")
        if two_pass_views:
            raise ValueError("engine='explicit' does not implement "
                             "two_pass_views (a single-device parity mode)")
        model, state, tx = init_explicit(cfg, k_init, mesh)
        engine = build_explicit_engine(cfg, model, tx, mesh)
    elif engine == "pjit":
        model, state, tx = init_simclr(cfg, k_init, mesh)
        engine = build_engine(cfg, model, tx, mesh, two_pass_views)
    else:
        raise ValueError(f"unknown engine {engine!r} "
                         "(expected 'pjit' or 'explicit')")
    if init_variables is not None:
        cast = lambda ref, new: jax.tree.map(
            lambda r, v: jnp.asarray(v, r.dtype), ref, new)
        state = state.replace(
            params=cast(state.params, init_variables["params"]),
            batch_stats=cast(state.batch_stats,
                             init_variables["batch_stats"]))

    history = History()
    start_epoch = 0
    if resume_from == "auto":
        # Elastic restart: resume from the newest checkpoint if any exists
        # (the reference requires an explicit --resume_training_path,
        # pretrain.py:34-37).
        resume_from = ckpt_lib.latest_checkpoint(cfg.ckpt_dir)
        if resume_from is None:
            log("auto-resume: no checkpoint found, starting fresh")
    if resume_from:
        # Reference resume: model + optimizer + epoch + histories
        # (model_utils.py:75-86).
        state, meta = ckpt_lib.load_checkpoint(resume_from, state)
        history = History.from_dict(meta.get("history"))
        start_epoch = meta["epoch"] + 1
        log(f"resumed from {resume_from} at epoch {start_epoch}")

    if save_checkpoints is None:
        save_checkpoints = tcfg.save_ckpt
    batch = tcfg.batch_size
    steps_per_epoch = split.train.n // batch
    print_every = max(
        int(steps_per_epoch * tcfg.log_every_fraction), 1)

    from simclr_tpu.utils.profiling import MetricsLogger, trace

    metrics = MetricsLogger(metrics_path) if metrics_path else None
    profiled = False

    total_steps = 0
    t_train = 0.0
    epoch_secs = []
    for epoch in range(start_epoch, tcfg.n_epoch):
        k_epoch = jax.random.fold_in(k_data, epoch)
        k_perm, k_steps, k_eval = jax.random.split(k_epoch, 3)
        idx_mat = epoch_permutation(k_perm, split.train.n, batch)

        t0 = time.perf_counter()
        if profile_dir and not profiled and epoch > start_epoch:
            # Trace the second epoch (first is dominated by compilation).
            profiled = True
            with trace(profile_dir):
                state, (losses, accs) = engine.train_epoch(
                    state, split.train.images, idx_mat, k_steps)
                jax.block_until_ready(losses)
        else:
            state, (losses, accs) = engine.train_epoch(
                state, split.train.images, idx_mat, k_steps)
        losses, accs = np.asarray(losses), np.asarray(accs)
        epoch_secs.append(time.perf_counter() - t0)
        t_train += epoch_secs[-1]
        total_steps += steps_per_epoch
        if metrics:
            metrics.log(
                total_steps, epoch=epoch + 1,
                train_loss=losses.mean(), train_acc=accs.mean(),
                epoch_seconds=time.perf_counter() - t0,
                steps_per_sec=steps_per_epoch
                / max(time.perf_counter() - t0, 1e-9))

        for s in range(0, steps_per_epoch, print_every):
            log(f"Epoch: {epoch + 1} | Iteration {s} | "
                f"Loss = {losses[s]:.4f} | Accuracy = {accs[s]:.4f}%")
        history.append("train", losses.mean(), accs.mean())

        if split.val is not None and split.val.n >= batch:
            v_idx = epoch_permutation(k_eval, split.val.n, batch)
            v_loss, v_acc = engine.eval_epoch(
                state, split.val.images, v_idx, k_eval)
            log(f"Epoch: {epoch + 1} | avg valid loss: "
                f"{float(v_loss):.4f} | avg valid accuracy: "
                f"{float(v_acc):.4f}%")
            history.append("valid", float(v_loss), float(v_acc))
            if metrics:
                metrics.log(total_steps, epoch=epoch + 1,
                            valid_loss=float(v_loss),
                            valid_acc=float(v_acc))

        if save_checkpoints and (epoch + 1) % tcfg.save_ckpt_every == 0:
            path = ckpt_lib.save_checkpoint(
                cfg.ckpt_dir, epoch, state, history.to_dict())
            log(f"checkpoint saved: {path}")

    final_export = None
    if export_path is not None or tcfg.n_epoch > start_epoch:
        final_export = export_path or os.path.join(
            cfg.out_dir,
            f"simclr_{'mod_loss_' if tcfg.modified_loss else ''}"
            f"bs{batch}_nepoch{tcfg.n_epoch}_{cfg.dataset.name}_"
            f"temp{str(tcfg.temperature).replace('.', '')}.msgpack")
        ckpt_lib.export_model(
            final_export, state.params, state.batch_stats, cfg.to_json())
        log(f"exported model: {final_export}")

    if save_plots and history.loss["train"]:
        # End-of-training loss/accuracy PNGs, like the reference
        # (utils/model_utils.py:158-163 calling visualizations.py:222-242).
        from simclr_tpu.utils.visualizations import plot_loss_acc

        os.makedirs(cfg.out_dir, exist_ok=True)
        tag = (f"{'mod_loss_' if tcfg.modified_loss else ''}"
               f"bs{batch}_nepoch{tcfg.n_epoch}_{cfg.dataset.name}_"
               f"temp{str(tcfg.temperature).replace('.', '')}")
        plot_loss_acc(history.loss["train"], history.accuracy["train"],
                      title=f"train_{tag}", save_plot=True,
                      save_dir=cfg.out_dir)
        if history.loss["valid"]:
            plot_loss_acc(history.loss["valid"],
                          history.accuracy["valid"],
                          title=f"valid_{tag}", save_plot=True,
                          save_dir=cfg.out_dir)
        log(f"saved loss/accuracy plots to {cfg.out_dir}")

    if metrics:
        metrics.close()
    sps = total_steps / t_train if t_train > 0 else 0.0
    warm = epoch_secs[1:] or epoch_secs
    steady = (steps_per_epoch / float(np.median(warm))) if warm else sps
    return PretrainResult(state=state, history=history,
                          export_path=final_export, steps_per_sec=sps,
                          steady_steps_per_sec=steady)
