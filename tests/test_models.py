"""Shape / parameter-count / behavioral tests for the model zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simclr_tpu.config import ModelConfig
from simclr_tpu.models import (
    MineNet,
    ResNetEncoder,
    SimCLR,
    SimCLRFineTune,
    SupervisedResNet,
)


def n_params(tree):
    return sum(x.size for x in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def simclr_vars():
    model = SimCLR(cfg=ModelConfig())
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    return model, model.init({"params": jax.random.key(0)}, x, train=False)


def test_simclr_output_shapes(simclr_vars):
    model, variables = simclr_vars
    x = jnp.zeros((4, 32, 32, 3))
    (h, z), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert h.shape == (4, 2048)
    assert z.shape == (4, 128)
    assert h.dtype == jnp.float32 and z.dtype == jnp.float32


def test_resnet50_param_count(simclr_vars):
    """Encoder must match torchvision ResNet-50 trunk (CIFAR stem).

    torchvision resnet50 has 25.557M params; minus fc (2048*1000+1000) and
    with the 3x3 stem (64*3*3*3 vs 64*3*7*7 kernel) the trunk is
    23,500,352 weights + BN params.
    """
    model, variables = simclr_vars
    f_params = variables["params"]["f"]
    # Torch trunk (conv+bn only, CIFAR stem) = 23_500_352 params where BN
    # contributes scale+bias and convs are bias-free.
    assert n_params(f_params) == 23_500_352


def test_projection_head_structure(simclr_vars):
    model, variables = simclr_vars
    g = variables["params"]["g"]
    assert g["linear0"]["kernel"].shape == (2048, 2048)
    assert "bias" in g["linear0"]
    assert g["linear1"]["kernel"].shape == (2048, 128)
    # Final projection layer is bias-free (reference: models/simclr.py:38).
    assert "bias" not in g["linear1"]


def test_stl_stem_downsamples():
    model = SimCLR(cfg=ModelConfig(low_quality_img=False))
    x = jnp.zeros((2, 96, 96, 3))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    (h, z) = model.apply(variables, x, train=False)
    assert h.shape == (2, 2048)


def test_mc_dropout_stochastic_at_eval():
    """MC-dropout: eval-mode forwards must still be stochastic
    (reference: models/resnets.py:110-113)."""
    model = SimCLR(cfg=ModelConfig(encoder="dropout"))
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        x, train=False,
    )
    h1, _ = model.apply(
        variables, x, train=False, rngs={"dropout": jax.random.key(2)}
    )
    h2, _ = model.apply(
        variables, x, train=False, rngs={"dropout": jax.random.key(3)}
    )
    assert not np.allclose(np.asarray(h1), np.asarray(h2))


def test_no_dropout_deterministic():
    model = SimCLR(cfg=ModelConfig())
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    h1, _ = model.apply(variables, x, train=False)
    h2, _ = model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2))


def test_finetune_params_superset_of_simclr(simclr_vars):
    """Fine-tune model must restore every pretrain param
    (reference: models/ssl.py:24-27 loads the full SimCLR state dict)."""
    _, sim_vars = simclr_vars
    model = SimCLRFineTune(cfg=ModelConfig())
    x = jnp.zeros((2, 32, 32, 3))
    ft_vars = model.init({"params": jax.random.key(0)}, x, train=False)
    sim_flat = jax.tree_util.tree_leaves_with_path(sim_vars["params"])
    ft_paths = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(ft_vars["params"])
    }
    for path, leaf in sim_flat:
        assert jax.tree_util.keystr(path) in ft_paths
    score = model.apply(ft_vars, x, train=False)
    assert score.shape == (2, 10)


def test_supervised_resnet(simclr_vars):
    model = SupervisedResNet()
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 10)
    # fc head: 2048*10 + 10 params on top of the trunk.
    assert n_params(variables["params"]) == 23_500_352 + 20_490


def test_mine_net_shapes():
    model = MineNet(hidden_size=512)
    x = jnp.zeros((8, 4096))
    variables = model.init(jax.random.key(0), x)
    out = model.apply(variables, x)
    assert out.shape == (8, 1)
    assert n_params(variables["params"]) == (
        4096 * 512 + 512 + 512 * 512 + 512 + 512 + 1
    )


def test_batch_stats_updated_in_train_mode(simclr_vars):
    model, variables = simclr_vars
    x = jax.random.normal(jax.random.key(5), (8, 32, 32, 3))
    _, updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    before = variables["batch_stats"]["f"]["stem_bn"]["mean"]
    after = updates["batch_stats"]["f"]["stem_bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_folded_block_matches_unfused_f32():
    """Weight-folded identity blocks (Bottleneck._folded_block) are exactly
    equivalent to the standard path in float32: same outputs, same batch
    stats, same gradients. conv(x, w) * A == conv(x, w * A)."""
    kw = dict(stage_sizes=(2, 2), width=8, low_quality_img=True,
              bn_stats_fraction=0.5, dtype=jnp.float32,
              bn_dtype=jnp.float32)
    enc_a = ResNetEncoder(**kw)
    enc_b = ResNetEncoder(**kw, fold_bn_scales=True)
    x = jax.random.normal(jax.random.key(1), (96, 8, 8, 3), jnp.float32)
    vs = enc_a.init({"params": jax.random.key(0)}, x, train=True)

    ya, upa = enc_a.apply(vs, x, train=True, mutable=["batch_stats"])
    yb, upb = enc_b.apply(vs, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(upa["batch_stats"]),
                    jax.tree.leaves(upb["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    # Eval mode folds running statistics.
    ye_a = enc_a.apply({"params": vs["params"], **upa}, x, train=False)
    ye_b = enc_b.apply({"params": vs["params"], **upb}, x, train=False)
    np.testing.assert_allclose(np.asarray(ye_a), np.asarray(ye_b),
                               rtol=1e-4, atol=1e-5)

    tgt = jax.random.normal(jax.random.key(7), (96, 32))

    def loss_fn(params, enc):
        y, _ = enc.apply({"params": params,
                          "batch_stats": vs["batch_stats"]},
                         x, train=True, mutable=["batch_stats"])
        return jnp.mean((y[:, :32] - tgt) ** 2)

    ga = jax.grad(loss_fn)(vs["params"], enc_a)
    gb = jax.grad(loss_fn)(vs["params"], enc_b)
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        a, b = np.ravel(a), np.ravel(b)
        denom = np.linalg.norm(a) * np.linalg.norm(b) + 1e-30
        assert float(np.dot(a, b) / denom) > 0.9999


def test_remat_stages_bit_identical():
    """remat_stages (jax.checkpoint over bottlenecks) must be a pure
    scheduling hint: bit-identical outputs, batch stats, and gradients
    under jit vs the standard path."""
    kw = dict(stage_sizes=(2, 2), width=8, low_quality_img=True,
              bn_stats_fraction=0.5, dtype=jnp.float32,
              bn_dtype=jnp.float32)
    enc_a = ResNetEncoder(**kw)
    enc_b = ResNetEncoder(**kw, remat_stages=(0, 1))
    x = jax.random.normal(jax.random.key(1), (32, 8, 8, 3), jnp.float32)
    vs = enc_a.init({"params": jax.random.key(0)}, x, train=True)
    # remat is a lifted transform, not a parameter change: same tree.
    assert jax.tree.structure(vs["params"]) == jax.tree.structure(
        enc_b.init({"params": jax.random.key(0)}, x, train=True)["params"])

    def loss_fn(params, enc):
        y, up = enc.apply({"params": params,
                           "batch_stats": vs["batch_stats"]},
                          x, train=True, mutable=["batch_stats"])
        return jnp.sum(y * y), up["batch_stats"]

    (la, sa), ga = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(p, enc_a), has_aux=True))(vs["params"])
    (lb, sb), gb = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(p, enc_b), has_aux=True))(vs["params"])
    assert float(la) == float(lb)
    for a, b in zip(jax.tree.leaves(sa), jax.tree.leaves(sb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
