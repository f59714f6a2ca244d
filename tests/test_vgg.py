"""VGG19 perceptual feature network tests."""
import jax
import jax.numpy as jnp
import numpy as np

from keypointnerf_tpu.models.vgg import VGG19Features, init_vgg_params, vgg_loss


def test_feature_shapes():
    params = init_vgg_params()
    x = jnp.zeros((1, 64, 64, 3))
    feats = VGG19Features().apply(params, x)
    # relu1_1 @64, relu2_1 @32, relu3_1 @16, relu4_1 @8
    assert feats[0].shape == (1, 64, 64, 64)
    assert feats[1].shape == (1, 32, 32, 128)
    assert feats[2].shape == (1, 16, 16, 256)
    assert feats[3].shape == (1, 8, 8, 512)


def test_vgg_param_count_matches_vgg19_prefix():
    params = init_vgg_params()
    n = sum(x.size for x in jax.tree.leaves(params))
    # conv params of vgg19 features[:21]:
    expect = 0
    prev = 3
    for w in (64, 64, 128, 128, 256, 256, 256, 256, 512):
        expect += prev * w * 9 + w
        prev = w
    assert n == expect


def test_vgg_loss_zero_for_identical():
    params = init_vgg_params()
    x = jnp.ones((32, 32, 3)) * 0.3
    assert float(vgg_loss(params, x, x)) == 0.0


def test_vgg_loss_positive_and_finite():
    params = init_vgg_params()
    k1, k2 = jax.random.split(jax.random.key(0))
    a = jax.random.uniform(k1, (32, 32, 3))
    b = jax.random.uniform(k2, (32, 32, 3))
    v = float(vgg_loss(params, a, b))
    assert v > 0.0 and np.isfinite(v)


def test_vgg_loss_differentiable():
    params = init_vgg_params()
    tar = jnp.zeros((16, 16, 3))

    def f(x):
        return vgg_loss(params, x, tar)

    g = jax.grad(f)(jnp.ones((16, 16, 3)) * 0.5)
    assert np.all(np.isfinite(g))
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_load_torch_vgg19_roundtrip(tmp_path):
    """Converter consumes a torchvision-layout state dict (OIHW -> HWIO)."""
    import torch

    from keypointnerf_tpu.models.vgg import _TORCH_CONV_IDX, load_torch_vgg19

    widths = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
              (256, 256), (256, 256), (256, 256), (256, 512)]
    sd = {}
    rng = np.random.default_rng(0)
    for (cin, cout), tidx in zip(widths, _TORCH_CONV_IDX):
        sd[f"features.{tidx}.weight"] = torch.tensor(
            rng.standard_normal((cout, cin, 3, 3)).astype(np.float32))
        sd[f"features.{tidx}.bias"] = torch.tensor(
            rng.standard_normal(cout).astype(np.float32))
    path = str(tmp_path / "vgg19.pth")
    torch.save(sd, path)

    params = load_torch_vgg19(path)
    k = params["params"]["conv_0_0"]["kernel"]
    assert k.shape == (3, 3, 3, 64)  # HWIO
    np.testing.assert_allclose(
        np.asarray(k),
        sd["features.0.weight"].numpy().transpose(2, 3, 1, 0),
    )
    # converted params drive the feature net
    feats = VGG19Features().apply(params, jnp.zeros((1, 32, 32, 3)))
    assert feats[3].shape == (1, 4, 4, 512)
    assert all(np.all(np.isfinite(f)) for f in feats)
