"""Tests for similarity metrics (vs torch oracles) and the viz suite."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from simclr_tpu.config import Config, ModelConfig
from simclr_tpu.data.pipeline import DeviceDataset
from simclr_tpu.utils.metrics import (
    bucketize_feature_values,
    calc_corrcoeff,
    calc_ned,
    calc_nsed,
    cosine_similarity,
    get_representation_analogy,
    get_similarity_metrics,
)
from simclr_tpu.utils.visualizations import (
    denormalize_image,
    flatten_grads,
    kde_comparison_plot,
    kde_single_model_plot,
    plot_grad_flow,
    plot_loss_acc,
    show_images,
    tsne_plot,
)


def rand_pair(seed, n=8, d=32):
    rng = np.random.RandomState(seed)
    return (rng.randn(n, d).astype(np.float32),
            rng.randn(n, d).astype(np.float32))


class TestMetricFormulas:
    """Oracles restate reference utils/metrics.py:11-55, 95."""

    def test_calc_ned(self):
        a, b = rand_pair(0)
        ta, tb = torch.from_numpy(a), torch.from_numpy(b)
        oracle = torch.sqrt(torch.mean(
            (F.normalize(ta, 2, 1) - F.normalize(tb, 2, 1)) ** 2, dim=1))
        np.testing.assert_allclose(
            np.asarray(calc_ned(jnp.asarray(a), jnp.asarray(b))),
            oracle.numpy(), rtol=1e-5)

    def test_calc_nsed(self):
        a, b = rand_pair(1)
        ta, tb = torch.from_numpy(a), torch.from_numpy(b)
        va = ta - ta.mean(1, keepdim=True)
        vb = tb - tb.mean(1, keepdim=True)
        sed = ((va - vb) ** 2).sum(1)
        denom = va.norm(dim=1) ** 2 + vb.norm(dim=1) ** 2
        np.testing.assert_allclose(
            np.asarray(calc_nsed(jnp.asarray(a), jnp.asarray(b))),
            (sed / denom).numpy(), rtol=1e-5)

    def test_calc_corrcoeff(self):
        a, b = rand_pair(2)
        ours = np.asarray(calc_corrcoeff(jnp.asarray(a), jnp.asarray(b)))
        for i in range(a.shape[0]):
            oracle = np.corrcoef(a[i], b[i])[0, 1]
            np.testing.assert_allclose(ours[i], oracle, rtol=1e-4)

    def test_cosine_similarity(self):
        a, b = rand_pair(3)
        oracle = torch.nn.CosineSimilarity(dim=1)(
            torch.from_numpy(a), torch.from_numpy(b))
        np.testing.assert_allclose(
            np.asarray(cosine_similarity(jnp.asarray(a), jnp.asarray(b))),
            oracle.numpy(), rtol=1e-5)

    def test_nmi_identity_and_independence(self):
        from simclr_tpu.utils.metrics import calc_nmi

        rng = np.random.RandomState(9)
        a = jnp.asarray(rng.randn(6, 512).astype(np.float32))
        nmi_self = np.asarray(calc_nmi(a, a))
        np.testing.assert_allclose(nmi_self, 1.0, atol=1e-4)
        b = jnp.asarray(rng.randn(6, 512).astype(np.float32))
        nmi_ind = np.asarray(calc_nmi(a, b))
        assert nmi_ind.max() < 0.25  # near-independent features
        # Correlated features land in between.
        c = a + 0.5 * b
        nmi_cor = np.asarray(calc_nmi(a, c))
        assert (nmi_cor > nmi_ind).all() and (nmi_cor < 1.0).all()

    def test_bucketize_shape(self):
        feat = jnp.asarray(np.random.RandomState(4).randn(6, 32))
        out = bucketize_feature_values(feat)
        assert out.shape == (1, 6, 32)
        assert int(jnp.max(out)) <= 17


class TestMetricDrivers:
    def test_similarity_metrics_separate_pos_neg(self):
        """An identity 'model' must score positives (two views of the same
        image) more similar than shuffled negatives."""
        rng = np.random.RandomState(5)
        imgs = rng.randint(0, 256, (64, 32, 32, 3)).astype(np.uint8)
        ds = DeviceDataset.from_numpy(imgs, np.zeros(64, np.int32))
        cfg = Config()

        def fn(variables, x, key):
            return x.reshape(x.shape[0], -1)

        m = get_similarity_metrics((fn, {}), ds, cfg, batch_size=32)
        assert m["pos_cos"].shape == (64,)
        assert m["pos_cos"].mean() > m["neg_cos"].mean()
        assert m["pos_ned"].mean() < m["neg_ned"].mean()

    def test_representation_analogy(self):
        rng = np.random.RandomState(6)
        imgs = rng.randint(0, 256, (16, 32, 32, 3)).astype(np.uint8)
        ds = DeviceDataset.from_numpy(imgs, np.zeros(16, np.int32))
        cfg = Config()

        def flip_invariant(variables, x, key):  # mean over W -> invariant
            return jnp.mean(x, axis=2).reshape(x.shape[0], -1)

        def flip_sensitive(variables, x, key):
            return x.reshape(x.shape[0], -1)

        out = get_representation_analogy(
            (flip_invariant, {}), (flip_sensitive, {}), ds, cfg,
            batch_size=16)
        assert out["model1_l2"] < out["model2_l2"]
        assert set(out) == {"model1_l1", "model1_l2",
                            "model2_l1", "model2_l2"}


class TestViz:
    def test_all_plots_save(self, tmp_path):
        rng = np.random.RandomState(7)
        metrics = {f"{p}_{k}": rng.rand(100)
                   for p in ("pos", "neg") for k in ("ned", "cc", "cos")}
        kde_comparison_plot(metrics, metrics, "ned",
                            save_path=str(tmp_path / "kde_cmp.png"))
        kde_single_model_plot(metrics, "cos",
                              save_path=str(tmp_path / "kde_one.png"))
        tsne_plot(rng.randn(60, 16), rng.randint(0, 3, 60),
                  save_path=str(tmp_path / "tsne.png"))
        plot_loss_acc([3.0, 2.0, 1.5], [10, 30, 50], title="t",
                      save_plot=True, save_dir=str(tmp_path))
        plot_grad_flow({"a/w": rng.randn(4, 4), "b/w": rng.randn(8)},
                       save_path=str(tmp_path / "gf.png"))
        show_images(rng.rand(6, 8, 8, 3),
                    save_path=str(tmp_path / "imgs.png"))
        for name in ("kde_cmp", "kde_one", "tsne", "t", "gf", "imgs"):
            assert (tmp_path / f"{name}.png").exists()

    def test_denormalize_roundtrip(self):
        rng = np.random.RandomState(8)
        img = rng.rand(4, 4, 3).astype(np.float32)
        mean, std = (0.5, 0.4, 0.3), (0.2, 0.25, 0.3)
        norm = (img - np.array(mean)) / np.array(std)
        np.testing.assert_allclose(
            denormalize_image(norm, mean, std), img, rtol=1e-5, atol=1e-6)

    def test_flatten_grads(self):
        tree = {"layer": {"w": jnp.ones((2, 2)), "b": jnp.zeros(2)}}
        flat = flatten_grads(tree)
        assert len(flat) == 2
        assert all(isinstance(v, np.ndarray) for v in flat.values())
