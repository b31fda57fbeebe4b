"""Cross-implementation model fidelity: our flax SimCLR vs the reference
PyTorch architecture, weight-for-weight.

The torch model below RESTATES the reference architecture as a test oracle
(the same approach as tests/test_losses.py): a torchvision ResNet-50 with
the CIFAR stem surgery (reference: models/resnets.py:8-36 — 3x3/stride-1
bias-free conv1, fresh bn1, no maxpool) plus the projection head Sequential
(reference: models/simclr.py:27-41 — Flatten, Linear(2048,2048),
BatchNorm1d, ReLU, Linear(2048,128,bias=False), BatchNorm1d). Weights are
ported through `simclr_tpu.utils.torch_port` and the two implementations
must agree on:

  * eval-mode forward (h, z) to float32 tolerance,
  * training-mode forward + gradients + several torch-parity Adam steps
    (optimizer semantics of reference pretrain.py:80: torch.optim.Adam
    with L2-into-gradient weight decay).

These tests pin stem surgery, BN momentum/eps/variance conventions, head
layout, layout transposes and optimizer semantics against drift.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from simclr_tpu.config import ModelConfig
from simclr_tpu.models.simclr import SimCLR
from simclr_tpu.train.common import adam_torch
from simclr_tpu.utils.torch_port import (
    simclr_from_torch_state_dict, simclr_to_torch_state_dict)

BATCH = 4


def make_reference_simclr(seed: int = 0):
    """Reference SimCLRMain restated in torch (oracle, not a port).

    The encoder restates torchvision's ResNet-50 Bottleneck structure —
    including the v1.5 convention of carrying the stride on the 3x3 conv —
    with the reference's CIFAR stem surgery (reference models/resnets.py:
    16-27: 3x3/stride-1 bias-free conv1, fresh bn1, skipped maxpool), using
    the exact attribute names torchvision uses so the state_dict key layout
    matches (layer{L}.{B}.conv{i}/bn{i}/downsample.{0,1}). Head per
    reference models/simclr.py:27-41 (num_proj_layers=2, no dropout).
    """
    import torch.nn as nn

    torch.manual_seed(seed)

    class TorchBottleneck(nn.Module):
        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                                   padding=1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(planes * 4)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class TorchEncoder(nn.Module):
        def __init__(self, stage_sizes=(3, 4, 6, 3)):
            super().__init__()
            # CIFAR stem surgery (reference models/resnets.py:16-19).
            self.conv1 = nn.Conv2d(3, 64, 3, stride=1, padding=1,
                                   bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            inplanes = 64
            for i, n_blocks in enumerate(stage_sizes):
                planes = 64 * 2 ** i
                stride = 1 if i == 0 else 2
                blocks = []
                for b in range(n_blocks):
                    s = stride if b == 0 else 1
                    down = None
                    if s != 1 or inplanes != planes * 4:
                        down = nn.Sequential(
                            nn.Conv2d(inplanes, planes * 4, 1, stride=s,
                                      bias=False),
                            nn.BatchNorm2d(planes * 4))
                    blocks.append(
                        TorchBottleneck(inplanes, planes, s, down))
                    inplanes = planes * 4
                setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))

        def forward(self, x):
            x = self.relu(self.bn1(self.conv1(x)))  # no maxpool (CIFAR)
            for i in range(4):
                x = getattr(self, f"layer{i + 1}")(x)
            return torch.flatten(self.avgpool(x), 1)

    # The reference names its head sub-modules via add_module (reference
    # models/simclr.py:28-39), so real checkpoints carry g.g_linear0.* /
    # g.g_bn0.* keys — the oracle must use the same names or converter
    # regressions on genuine reference layouts go unnoticed.
    head = nn.Sequential()
    head.add_module("g_flatten", nn.Flatten())
    head.add_module("g_linear0", nn.Linear(2048, 2048))
    head.add_module("g_bn0", nn.BatchNorm1d(2048))
    head.add_module("g_relu0", nn.ReLU(inplace=True))
    head.add_module("g_linear1", nn.Linear(2048, 128, bias=False))
    head.add_module("g_bn1", nn.BatchNorm1d(128))

    class Ref(nn.Module):
        def __init__(self):
            super().__init__()
            self.f = TorchEncoder()
            self.g = head

        def forward(self, x):
            h = self.f(x)
            return h, self.g(h)

    return Ref()


def f32_model_cfg() -> ModelConfig:
    """Full-precision, full-batch-stats config for bit-level comparison.
    bn_grad_mode='exact': torch's BN backward is the true autodiff one, so
    the gradient comparison must run the exact mode (the production
    'subset_st' default intentionally deviates — results/parity_stgrad)."""
    return ModelConfig(compute_dtype="float32", bn_dtype="float32",
                       bn_stats_fraction=1.0, bn_grad_mode="exact")


def tree_paths(tree):
    return {
        jax.tree_util.keystr(kp): v.shape
        for kp, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


@pytest.fixture()  # function-scoped: the Adam test mutates the torch model
def ported():
    """Torch reference model with warmed running stats + ported flax trees."""
    ref = make_reference_simclr()
    # Populate non-trivial running statistics before the eval comparison.
    ref.train()
    with torch.no_grad():
        ref(torch.randn(8, 3, 32, 32, generator=torch.Generator()
                        .manual_seed(1)))
    ref.eval()
    params, stats = simclr_from_torch_state_dict(ref.state_dict())
    return ref, params, stats


def test_ported_tree_structure_matches_init(ported):
    _, params, stats = ported
    model = SimCLR(cfg=f32_model_cfg())
    variables = model.init(
        {"params": jax.random.key(0)},
        jnp.zeros((2, 32, 32, 3), jnp.float32), train=False)
    assert tree_paths(params) == tree_paths(variables["params"])
    assert tree_paths(stats) == tree_paths(variables["batch_stats"])


def test_eval_forward_parity(ported):
    ref, params, stats = ported
    rng = np.random.RandomState(2)
    x = rng.randn(BATCH, 3, 32, 32).astype(np.float32)

    with torch.no_grad():
        h_t, z_t = ref(torch.from_numpy(x))
    h_t, z_t = h_t.numpy(), z_t.numpy()

    model = SimCLR(cfg=f32_model_cfg())
    h_j, z_j = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(h_j), h_t, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(z_j), z_t, atol=2e-3, rtol=1e-2)


def test_train_forward_and_gradient_parity(ported):
    """Train-mode (batch-statistics) forward loss and full parameter
    gradients must match torch. Loss: regression to fixed random targets —
    real gradient signal through every layer (unlike mean(z^2), which is
    ~1 by BN construction with eps-scale gradients).

    We do NOT compare multi-step Adam trajectories element-wise: the first
    Adam step is ~lr*sign(g), so f32 noise on near-zero grad elements flips
    entries and the trajectory is chaotic. Optimizer semantics are pinned
    exactly by test_adam_optimizer_exact_parity below.
    """
    ref, params, stats = ported
    rng = np.random.RandomState(3)
    x = rng.randn(BATCH, 3, 32, 32).astype(np.float32)
    t = rng.randn(BATCH, 128).astype(np.float32)

    ref.train()
    ref.zero_grad()
    _, z = ref(torch.from_numpy(x))
    loss_t = ((z - torch.from_numpy(t)) ** 2).mean()
    loss_t.backward()
    torch_grads = {k: p.grad.detach().numpy().copy()
                   for k, p in ref.named_parameters()}

    model = SimCLR(cfg=f32_model_cfg())

    def objective(p):
        (_, z), _ = model.apply(
            {"params": p, "batch_stats": stats},
            jnp.asarray(x.transpose(0, 2, 3, 1)), train=True,
            mutable=["batch_stats"])
        return jnp.mean((z - jnp.asarray(t)) ** 2)

    loss_j, grads = jax.value_and_grad(objective)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4)

    grads_sd = simclr_to_torch_state_dict(
        grads, jax.tree.map(jnp.zeros_like, stats))
    checked = 0
    for key, tg in torch_grads.items():
        jg = grads_sd[key]
        tg, jg = tg.reshape(-1), jg.reshape(-1)
        nt, nj = np.linalg.norm(tg), np.linalg.norm(jg)
        if nt < 1e-5:
            # Mathematically-zero grads (e.g. a Linear bias feeding straight
            # into BatchNorm) are pure f32 noise in both frameworks.
            assert nj < 1e-5, key
            continue
        # f32 reduction-order noise on BN scale grads reaches ~0.6% of norm.
        assert nj == pytest.approx(nt, rel=2e-2), key
        cos = float(tg @ jg) / (nt * nj)
        assert cos > 0.998, f"{key}: grad cos={cos:.5f}"
        checked += 1
    assert checked > 150  # every conv/bn/linear tensor in ResNet-50 + head


def test_adam_optimizer_exact_parity():
    """adam_torch (train/common.py:38-52) == torch.optim.Adam bit-for-bit
    on a deterministic synthetic gradient sequence, including the
    L2-into-gradient weight-decay semantics (reference pretrain.py:80)."""
    rng = np.random.RandomState(0)
    shapes = [(16, 8), (8,), (4, 4, 3, 2)]
    w0 = [rng.randn(*s).astype(np.float32) for s in shapes]
    grad_seq = [[rng.randn(*s).astype(np.float32) * 10 ** rng.uniform(-3, 1)
                 for s in shapes] for _ in range(5)]

    # torch
    tp = [torch.nn.Parameter(torch.from_numpy(w.copy())) for w in w0]
    opt = torch.optim.Adam(tp, lr=1e-3, weight_decay=1e-6)
    for gs in grad_seq:
        opt.zero_grad()
        for p, g in zip(tp, gs):
            p.grad = torch.from_numpy(g.copy())
        opt.step()

    # optax chain
    tx = adam_torch(1e-3, weight_decay=1e-6)
    params = [jnp.asarray(w) for w in w0]
    state = tx.init(params)
    for gs in grad_seq:
        updates, state = tx.update([jnp.asarray(g) for g in gs], state,
                                   params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    for p_t, p_j in zip(tp, params):
        np.testing.assert_allclose(
            np.asarray(p_j), p_t.detach().numpy(), atol=1e-6, rtol=1e-5)


def test_head_numeric_sequential_layout_tolerated(ported):
    """Hand-built exports may use a plain numeric nn.Sequential head
    (`g.1.weight`, `g.2.*`, ...); the importer must map it to the same tree
    as the reference's named add_module layout."""
    import torch.nn as nn

    ref, params, _ = ported
    named_sd = {k: v for k, v in ref.state_dict().items()
                if k.startswith("g.")}
    plain = nn.Sequential(
        nn.Flatten(), nn.Linear(2048, 2048), nn.BatchNorm1d(2048),
        nn.ReLU(), nn.Linear(2048, 128, bias=False), nn.BatchNorm1d(128))
    plain.load_state_dict({
        k.replace("g_linear0", "1").replace("g_bn0", "2")
         .replace("g_linear1", "4").replace("g_bn1", "5")
         .removeprefix("g."): v for k, v in named_sd.items()})
    numeric_sd = {f"g.{k}": v for k, v in plain.state_dict().items()}

    p_numeric, s_numeric = simclr_from_torch_state_dict(numeric_sd)
    for (kp, a), (kp2, b) in zip(
            jax.tree_util.tree_flatten_with_path(p_numeric["g"])[0],
            jax.tree_util.tree_flatten_with_path(params["g"])[0]):
        assert jax.tree_util.keystr(kp) == jax.tree_util.keystr(kp2)
        np.testing.assert_array_equal(a, b)


def test_supervised_head_sequential_layout():
    """supervised_head round-trips through the reference's
    Sequential(Flatten, Linear) key layout (`supervised_head.1.*`,
    reference models/ssl.py:29-30)."""
    rng = np.random.RandomState(7)
    w = rng.randn(10, 2048).astype(np.float32)
    b = rng.randn(10).astype(np.float32)
    params, _ = simclr_from_torch_state_dict({
        "supervised_head.1.weight": w, "supervised_head.1.bias": b})
    np.testing.assert_array_equal(params["supervised_head"]["kernel"], w.T)
    np.testing.assert_array_equal(params["supervised_head"]["bias"], b)

    out = simclr_to_torch_state_dict(
        {"f": {"stem_conv": {"kernel": np.zeros((3, 3, 3, 4), np.float32)},
               "stem_bn": {"scale": np.ones(4, np.float32),
                           "bias": np.zeros(4, np.float32)}},
         "g": {},
         "supervised_head": {"kernel": w.T, "bias": b}},
        {"f": {"stem_bn": {"mean": np.zeros(4, np.float32),
                           "var": np.ones(4, np.float32)}},
         "g": {}})
    np.testing.assert_array_equal(out["supervised_head.1.weight"], w)
    np.testing.assert_array_equal(out["supervised_head.1.bias"], b)


def test_state_dict_round_trip(ported):
    """to_torch(from_torch(sd)) reproduces every tensor exactly."""
    ref, params, stats = ported
    sd = {k: v for k, v in ref.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    back = simclr_to_torch_state_dict(params, stats)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k].detach().numpy(),
                                      err_msg=k)
