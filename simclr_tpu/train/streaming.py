"""Host-streaming pretraining for datasets beyond HBM capacity.

The default pipeline keeps the whole dataset device-resident
(data/pipeline.py); this driver covers the case where it doesn't fit: raw
uint8 batches stay on the host (optionally assembled by the C++ data plane,
data/native) and are fed through `host_stream`'s double-buffered
`jax.device_put` — the transfer of batch t+1 overlaps the device computing
batch t, so the TPU never waits on PCIe. The jitted step is the same
gather-free `train_step_direct` the resident path uses.

This is the TPU-native replacement for the role of the reference's
DataLoader worker prefetching (reference: data.py:318-321, num_workers=2).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import numpy as np

from simclr_tpu.config import Config
from simclr_tpu.data.pipeline import host_stream
from simclr_tpu.train.common import History
from simclr_tpu.train.pretrain import PretrainResult, build_engine, \
    init_simclr


def pretrain_streaming(
    cfg: Config,
    images: np.ndarray,                  # (N, H, W, C) uint8, host
    labels: Optional[np.ndarray] = None,
    n_epochs: Optional[int] = None,
    use_native_pipeline: bool = False,
    log: Callable[[str], None] = print,
) -> PretrainResult:
    """Pretrain from a host-resident uint8 dataset with double-buffered
    device feeding. `use_native_pipeline=True` assembles shuffled batches
    in the C++ data plane's worker thread instead of numpy indexing."""
    tcfg = cfg.train
    n_epochs = n_epochs or tcfg.n_epoch
    batch = tcfg.batch_size
    key = jax.random.key(tcfg.seed)
    k_init, k_loop = jax.random.split(key)

    model, state, tx = init_simclr(cfg, k_init)
    engine = build_engine(cfg, model, tx)
    step_fn = engine.train_step_direct

    if labels is None:
        labels = np.zeros((images.shape[0],), np.int32)

    native_pipe = None
    if use_native_pipeline:
        from simclr_tpu.data.native import NativePipeline

        native_pipe = NativePipeline(images, labels, batch,
                                     seed=tcfg.seed)

    history = History()
    steps_per_epoch = images.shape[0] // batch
    total_steps, t_train = 0, 0.0
    try:
        for epoch in range(n_epochs):
            k_ep = jax.random.fold_in(k_loop, epoch)
            losses, accs = [], []
            t0 = time.perf_counter()
            if native_pipe is not None:
                def batches():
                    for _ in range(steps_per_epoch):
                        imgs, _ = native_pipe.next()
                        yield jax.device_put(imgs), None
                it = batches()
            else:
                it = ((img, lab) for img, lab in host_stream(
                    images, labels, batch, jax.random.fold_in(k_ep, 0)))
            step_keys = jax.random.split(
                jax.random.fold_in(k_ep, 1), steps_per_epoch)
            for s, (batch_imgs, _) in enumerate(it):
                state, (loss, acc) = step_fn(state, batch_imgs,
                                             step_keys[s])
                losses.append(loss)
                accs.append(acc)
            losses = np.asarray(jax.device_get(losses))
            accs = np.asarray(jax.device_get(accs))
            t_train += time.perf_counter() - t0
            total_steps += steps_per_epoch
            history.append("train", losses.mean(), accs.mean())
            log(f"Epoch: {epoch + 1} | Loss = {losses.mean():.4f} | "
                f"Accuracy = {accs.mean():.4f}%")
    finally:
        if native_pipe is not None:
            native_pipe.close()

    sps = total_steps / t_train if t_train > 0 else 0.0
    return PretrainResult(state=state, history=history,
                          export_path=None, steps_per_sec=sps)
