"""Golden numeric tests for the torch->Flax reference-checkpoint importer.

Each test builds a fresh torch module with the reference architecture and
state-dict key layout (reference src/utils.py / src/model.py — re-expressed
here, not copied), runs it on a fixed input, imports its state_dict through
`utils/import_torch.py`, runs the Flax twin, and asserts numeric parity.
This is the machinery that makes a reference-trained `last.ckpt` render
identically in this framework (VERDICT r1 task 2).

All torch runs are CPU f32.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from keypointnerf_tpu.models.cnn import (  # noqa: E402
    ConvBlock,
    HGFilter,
    ResBlkEncoder,
)
from keypointnerf_tpu.models.ibr_head import IBRRenderingHead  # noqa: E402
from keypointnerf_tpu.models.mlp import GeoFusionMLP  # noqa: E402
from keypointnerf_tpu.utils.import_torch import (  # noqa: E402
    _convblock,
    _hgfilter,
    _ibr_head,
    _mlp_layers,
    _resblk_encoder,
    _SD,
    convert_reference_state_dict,
)

torch.manual_seed(0)


def _gn(c):
    return tnn.GroupNorm(min(32, c), c)


# ------------------------------------------------------------ torch fixtures
class TConvBlock(tnn.Module):
    """Reference-layout ConvBlock (pre-activation 3-scale residual,
    src/utils.py:416-474)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.bn1, self.conv1 = _gn(cin), tnn.Conv2d(cin, cout // 2, 3, padding=1, bias=False)
        self.bn2, self.conv2 = _gn(cout // 2), tnn.Conv2d(cout // 2, cout // 4, 3, padding=1, bias=False)
        self.bn3, self.conv3 = _gn(cout // 4), tnn.Conv2d(cout // 4, cout // 4, 3, padding=1, bias=False)
        if cin != cout:
            self.bn4 = _gn(cin)
            self.downsample = tnn.Sequential(
                self.bn4, tnn.ReLU(), tnn.Conv2d(cin, cout, 1, bias=False)
            )
        else:
            self.downsample = None

    def forward(self, x):
        a = self.conv1(torch.relu(self.bn1(x)))
        b = self.conv2(torch.relu(self.bn2(a)))
        c = self.conv3(torch.relu(self.bn3(b)))
        out = torch.cat([a, b, c], 1)
        return out + (self.downsample(x) if self.downsample is not None else x)


class THourGlass(tnn.Module):
    """Reference-layout recursive hourglass with flat level-suffixed module
    names (src/utils.py:261-309)."""

    def __init__(self, depth, feats):
        super().__init__()
        self.depth = depth
        for lvl in range(depth, 0, -1):
            self.add_module(f"b1_{lvl}", TConvBlock(feats, feats))
            self.add_module(f"b2_{lvl}", TConvBlock(feats, feats))
            self.add_module(f"b3_{lvl}", TConvBlock(feats, feats))
        self.add_module("b2_plus_1", TConvBlock(feats, feats))

    def _run(self, lvl, x):
        up1 = self._modules[f"b1_{lvl}"](x)
        low = self._modules[f"b2_{lvl}"](torch.nn.functional.avg_pool2d(x, 2))
        if lvl > 1:
            low = self._run(lvl - 1, low)
        else:
            low = self._modules["b2_plus_1"](low)
        low = self._modules[f"b3_{lvl}"](low)
        up2 = torch.nn.functional.interpolate(
            low, scale_factor=2, mode="bicubic", align_corners=True
        )
        return up1 + up2

    def forward(self, x):
        return self._run(self.depth, x)


class THGFilter(tnn.Module):
    """Reference-layout HGFilterV2, n_stack=1 (src/utils.py:322-414)."""

    def __init__(self, n_downsample=2, out_ch=64, out_ch_hd=8):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3)
        self.bn1 = tnn.GroupNorm(32, 64)
        self.conv2 = TConvBlock(64, 128)
        self.unpack1 = tnn.Module()
        self.unpack1.conv = tnn.ConvTranspose2d(128, 32, 3, stride=2, padding=1,
                                                output_padding=1, bias=False)
        self.unpack1.norm = tnn.GroupNorm(32, 32)
        self.conv_out = tnn.Conv2d(32, out_ch_hd, 5, padding=2)
        self.conv3 = TConvBlock(128, 128)
        self.conv4 = TConvBlock(128, 256)
        self.m0 = THourGlass(n_downsample, 256)
        self.top_m_0 = TConvBlock(256, 256)
        self.conv_last0 = tnn.Conv2d(256, 256, 1)
        self.bn_end0 = tnn.GroupNorm(32, 256)
        self.l0 = tnn.Conv2d(256, out_ch, 1)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.conv2(x)
        x_hd = self.conv_out(torch.relu(self.unpack1.norm(self.unpack1.conv(x))))
        x = torch.nn.functional.avg_pool2d(x, 2)
        x = self.conv4(self.conv3(x))
        ll = self.top_m_0(self.m0(x))
        ll = torch.relu(self.bn_end0(self.conv_last0(ll)))
        return self.l0(ll), x_hd


class TResBlk(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.layers = tnn.Sequential(
            tnn.ReplicationPad2d(1), tnn.Conv2d(ch, ch, 3), tnn.InstanceNorm2d(ch),
            tnn.ReLU(), tnn.ReplicationPad2d(1), tnn.Conv2d(ch, ch, 3),
            tnn.InstanceNorm2d(ch),
        )

    def forward(self, x):
        return x + self.layers(x)


class TResBlkEncoder(tnn.Module):
    """Reference-layout ResBlkEncoder Sequential (src/utils.py:216-259)."""

    def __init__(self, out_ch=8, ngf=16, n_down=3, n_blocks=2, n_up=2):
        super().__init__()
        L = [tnn.ReplicationPad2d(3), tnn.Conv2d(3, ngf, 7),
             tnn.InstanceNorm2d(ngf), tnn.ReLU()]
        for i in range(n_down):
            m = 2**i
            L += [tnn.Conv2d(ngf * m, ngf * m * 2, 3, stride=2, padding=1),
                  tnn.InstanceNorm2d(ngf * m * 2), tnn.ReLU()]
        m = 2**n_down
        for _ in range(n_blocks):
            L += [TResBlk(ngf * m)]
        for i in range(n_up):
            m = 2 ** (n_down - i)
            L += [tnn.ConvTranspose2d(ngf * m, ngf * m // 2, 3, stride=2,
                                      padding=1, output_padding=1),
                  tnn.InstanceNorm2d(ngf * m // 2), tnn.ReLU()]
        L += [tnn.ReplicationPad2d(3),
              tnn.Conv2d(ngf * 2 ** (n_down - n_up + 1) // 2, out_ch, 7)]
        self.layers = tnn.Sequential(*L)

    def forward(self, x):
        return self.layers(x)


class TLinear(tnn.Module):
    def __init__(self, n_in, n_out, wn):
        super().__init__()
        lin = tnn.Linear(n_in, n_out)
        self.linear = tnn.utils.weight_norm(lin) if wn else lin

    def forward(self, x):
        return self.linear(x)


def t_softplus100(x):
    return tnn.functional.softplus(x, beta=100, threshold=20)


class TMLPUNet(tnn.Module):
    """Reference-layout skip-injected MLP (src/utils.py:649-720)."""

    def __init__(self, dims, skip_dims, skip_layers):
        super().__init__()
        self.skip = {j: i for i, j in enumerate(skip_layers)}
        self.layers = tnn.ModuleList()
        for i in range(len(dims) - 1):
            cin = dims[i] + (skip_dims[self.skip[i]] if i in self.skip else 0)
            self.layers.append(TLinear(cin, dims[i + 1], wn=i != len(dims) - 2))

    def forward(self, x, feats):
        for i, l in enumerate(self.layers):
            if i in self.skip:
                x = torch.cat([x, feats[self.skip[i]]], -1)
            x = l(x)
            if i != len(self.layers) - 1:
                x = t_softplus100(x)
        return x


class TIBRHead(tnn.Module):
    """Reference-layout IBRRenderingHead (src/model.py:1239-1302)."""

    def __init__(self, in_ch=32):
        super().__init__()
        elu = tnn.ELU()
        self.ani_al = tnn.Parameter(torch.tensor(0.2))
        self.ray_encoder = tnn.Sequential(tnn.Linear(4, 16), elu,
                                          tnn.Linear(16, in_ch + 3), elu)
        self.base_layer = tnn.Sequential(tnn.Linear((in_ch + 3) * 3, 64), elu,
                                         tnn.Linear(64, 32), elu)
        self.vis_layer1 = tnn.Sequential(tnn.Linear(32, 32), elu,
                                         tnn.Linear(32, 33), elu)
        self.vis_layer2 = tnn.Sequential(tnn.Linear(32, 32), elu,
                                         tnn.Linear(32, 1), tnn.Sigmoid())
        self.out_layer = tnn.Sequential(tnn.Linear(32 + 1 + 4, 16), elu,
                                        tnn.Linear(16, 8), elu, tnn.Linear(8, 1))

    def forward(self, rgb_feats, ray_diffs, proj_mask):
        # layout (rays, samples, views, C) like the reference call site
        V = rgb_feats.shape[2]
        dir_feat = self.ray_encoder(ray_diffs)
        src_rgb = rgb_feats[..., :3]
        w = dir_feat.shape[-1]
        rgb_feats = torch.cat([rgb_feats[..., :w] + dir_feat, rgb_feats[..., w:]], -1)
        dot = ray_diffs[..., 3:]
        e = torch.exp(torch.abs(self.ani_al) * (dot - 1))
        weight = (e - e.min(dim=2, keepdim=True)[0]) * proj_mask
        weight = weight / (weight.sum(dim=2, keepdim=True) + 1e-8)
        mean = (weight * rgb_feats).sum(2, keepdim=True)
        var = (weight * (rgb_feats - mean) ** 2).sum(2, keepdim=True)
        fused = torch.cat([mean, var], -1)
        x = self.base_layer(torch.cat([fused.expand(-1, -1, V, -1), rgb_feats], -1))
        pv = self.vis_layer1(x * weight)
        res, vis = pv[..., :-1], pv[..., -1:]
        x = x + res
        vis = self.vis_layer2(x * torch.sigmoid(vis) * proj_mask) * proj_mask
        logits = self.out_layer(torch.cat([x, vis, ray_diffs], -1))
        logits = logits.masked_fill(proj_mask == 0, -1e9)
        return (src_rgb * torch.softmax(logits, dim=2)).sum(2)


# ---------------------------------------------------------------- the tests
def _to_jax_nhwc(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def _from_jax_nhwc(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def _root(sd):
    """Adapter: the converter helpers join keys as f"{key}.child"; for a
    root-level module (key="") that yields ".child" — strip the dot."""
    from keypointnerf_tpu.utils import import_torch as it

    class Root(it._SD):
        def __init__(self, inner):
            self.sd = inner.sd
            self.prefix = inner.prefix
            self.used = inner.used

        def __call__(self, key):
            return super().__call__(key.lstrip("."))

        def has(self, key):
            return super().has(key.lstrip("."))

    return Root(sd)


def test_convblock_import_parity():
    tm = TConvBlock(64, 128).eval()
    x = torch.randn(1, 64, 16, 16)
    with torch.no_grad():
        ref = tm(x).numpy()
    sd = _SD(dict(tm.state_dict()))
    params = {"params": jax.tree.map(jnp.asarray, _convblock(_root(sd), "", True))}
    out = ConvBlock(128).apply(params, _to_jax_nhwc(x))
    np.testing.assert_allclose(_from_jax_nhwc(out), ref, atol=2e-5)


def test_hgfilter_import_parity():
    tm = THGFilter(n_downsample=2).eval()
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        coarse_t, hd_t = tm(x)
    sd = _SD(dict(tm.state_dict()))
    params = {"params": jax.tree.map(jnp.asarray, _hgfilter(_root(sd), "", 1, 2))}
    model = HGFilter(n_stack=1, n_downsample=2)
    coarse, hd = model.apply(params, _to_jax_nhwc(x))
    np.testing.assert_allclose(
        _from_jax_nhwc(coarse), coarse_t.numpy(), atol=5e-5
    )
    np.testing.assert_allclose(_from_jax_nhwc(hd), hd_t.numpy(), atol=5e-5)


def test_resblk_encoder_import_parity():
    tm = TResBlkEncoder(ngf=16, n_blocks=2).eval()
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        ref = tm(x).numpy()
    sd = _SD(dict(tm.state_dict()))
    conv = _resblk_encoder(_root(sd), "", 3, 2, 2)
    params = {"params": jax.tree.map(jnp.asarray, conv)}
    model = ResBlkEncoder(out_ch=8, ngf=16, n_downsample=3, n_blocks=2, n_upsample=2)
    out = model.apply(params, _to_jax_nhwc(x))
    np.testing.assert_allclose(_from_jax_nhwc(out), ref, atol=5e-5)


def test_geo_mlp_import_parity():
    dims1, dims2 = (168, 128, 128, 120, 64), (128, 64, 64, 2)
    t1 = TMLPUNet(dims1, (64, 8), (0, 2)).eval()
    t2 = TMLPUNet(dims2, (), ()).eval()
    sd = {}
    for k, v in t1.state_dict().items():
        sd["mlp_geo.layers1." + k] = v
    for k, v in t2.state_dict().items():
        sd["mlp_geo.layers2." + k] = v
    sdv = _SD(sd)
    params = {"params": jax.tree.map(jnp.asarray, {
        "MLPUNet_0": _mlp_layers(sdv, "mlp_geo.layers1", 4),
        "MLP_0": _mlp_layers(sdv, "mlp_geo.layers2", 3),
    })}

    V, N = 3, 64
    g = torch.Generator().manual_seed(3)
    sp = torch.randn(V, N, 168, generator=g)
    f0 = torch.randn(V, N, 64, generator=g)
    f1 = torch.randn(V, N, 8, generator=g)
    mask = (torch.rand(V, N, 1, generator=g) > 0.3).float()
    w = mask / (mask.sum(0, keepdim=True) + 1e-6)
    with torch.no_grad():
        lv = t1(sp, [f0, f1])
        mean = (w * lv).sum(0)
        var = (w * (lv - mean[None]) ** 2).sum(0)
        lf = torch.cat([mean, var], -1)
        ref = t2(lf, []).numpy()

    model = GeoFusionMLP(dims1, dims2, (64, 8), (0, 2))
    out, valid, _, _ = model.apply(
        params, jnp.asarray(sp.numpy()),
        [jnp.asarray(f0.numpy()), jnp.asarray(f1.numpy())],
        jnp.asarray(mask.numpy()), jnp.asarray(w.numpy()),
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_ibr_head_import_parity():
    tm = TIBRHead().eval()
    sd = {"mlp_tex." + k: v for k, v in tm.state_dict().items()}
    params = {"params": jax.tree.map(jnp.asarray, _ibr_head(_SD(sd), "mlp_tex"))}

    R, S, V = 4, 8, 3
    g = torch.Generator().manual_seed(5)
    rgbf = torch.rand(R, S, V, 35, generator=g)
    rdiff = torch.randn(R, S, V, 4, generator=g) * 0.1
    pmask = (torch.rand(R, S, V, 1, generator=g) > 0.2).float()
    with torch.no_grad():
        ref = tm(rgbf, rdiff, pmask).numpy()  # (R, S, 3)

    # flax head is view-major (V, N, C)
    to_vm = lambda t: jnp.asarray(
        t.numpy().transpose(2, 0, 1, 3).reshape(V, R * S, -1)
    )
    out = IBRRenderingHead().apply(
        params, to_vm(rgbf), to_vm(rdiff), to_vm(pmask)
    )  # (N, 3)
    np.testing.assert_allclose(
        np.asarray(out).reshape(R, S, 3), ref, atol=2e-5
    )


def test_full_state_dict_convert_structure():
    """End-to-end: a full reference-layout state_dict (with the Lightning
    'model.' prefix) converts into exactly the tree KeypointNeRF.init
    produces — same keys, same shapes."""
    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch

    cfg = KeypointNeRFConfig(
        n_coarse=4, n_fine=4, patch_h=4, patch_w=4, geo_n_downsample=2
    )
    hg = THGFilter(n_downsample=2)
    tex = TResBlkEncoder(out_ch=8, ngf=64, n_down=3, n_blocks=4, n_up=2)
    mlp1 = TMLPUNet((168, 128, 128, 120, 64), (64, 8), (0, 2))
    mlp2 = TMLPUNet((128, 64, 64, 2), (), ())
    ibr = TIBRHead()
    gc = tnn.Linear(128, 24)
    sd = {}
    for mod, name in ((hg, "geo_encoder"), (tex, "tex_encoder"), (ibr, "mlp_tex")):
        for k, v in mod.state_dict().items():
            sd[f"model.{name}.{k}"] = v
    for k, v in mlp1.state_dict().items():
        sd[f"model.mlp_geo.layers1.{k}"] = v
    for k, v in mlp2.state_dict().items():
        sd[f"model.mlp_geo.layers2.{k}"] = v
    for k, v in gc.state_dict().items():
        sd[f"model.ibr_compress_gfeat.{k}"] = v

    params = convert_reference_state_dict(sd, cfg)

    model = KeypointNeRF(cfg)
    sample = make_sample(SyntheticConfig(image_size=64), seed=0)
    vb = ViewBatch(**jax.tree.map(jnp.asarray, sample))
    init = model.init(
        {"params": jax.random.key(0), "render": jax.random.key(1)}, vb, True
    )

    flat_a = {"/".join(str(p.key) for p in path): leaf.shape
              for path, leaf in jax.tree_util.tree_leaves_with_path(init)}
    flat_b = {"/".join(str(p.key) for p in path): leaf.shape
              for path, leaf in jax.tree_util.tree_leaves_with_path(params)}
    assert flat_a == flat_b

    # and the converted params actually run the full model
    out = model.apply(params, vb, True, rngs={"render": jax.random.key(2)})
    assert np.all(np.isfinite(out["rgb_fine"]))


def test_full_import_render_golden():
    """End-to-end import golden (VERDICT r2 item 5): a complete
    reference-layout state_dict with DETERMINISTIC (numpy-seeded,
    torch-version-independent) weights is converted in strict mode — every
    source tensor must be consumed — and the full model renders a fixed
    synthetic scene to committed numeric goldens. Any drift in a layer
    mapping (a swapped Dense index, a transposed kernel, a missed
    weight-norm) changes the image and fails here."""
    from keypointnerf_tpu.data import SyntheticConfig, make_sample
    from keypointnerf_tpu.models import KeypointNeRF, KeypointNeRFConfig, ViewBatch

    cfg = KeypointNeRFConfig(
        n_coarse=4, n_fine=4, patch_h=4, patch_w=4, geo_n_downsample=2
    )
    hg = THGFilter(n_downsample=2)
    tex = TResBlkEncoder(out_ch=8, ngf=64, n_down=3, n_blocks=4, n_up=2)
    mlp1 = TMLPUNet((168, 128, 128, 120, 64), (64, 8), (0, 2))
    mlp2 = TMLPUNet((128, 64, 64, 2), (), ())
    ibr = TIBRHead()
    gc = tnn.Linear(128, 24)
    sd = {}
    for mod, name in ((hg, "geo_encoder"), (tex, "tex_encoder"), (ibr, "mlp_tex")):
        for k, v in mod.state_dict().items():
            sd[f"model.{name}.{k}"] = v
    for k, v in mlp1.state_dict().items():
        sd[f"model.mlp_geo.layers1.{k}"] = v
    for k, v in mlp2.state_dict().items():
        sd[f"model.mlp_geo.layers2.{k}"] = v
    for k, v in gc.state_dict().items():
        sd[f"model.ibr_compress_gfeat.{k}"] = v
    # overwrite every tensor with values seeded by ITS KEY: deterministic
    # across torch versions, and a key/mapping swap cannot cancel out
    for k, v in sd.items():
        seed = int.from_bytes(k.encode()[-8:], "little") % (2**31)
        vals = np.random.default_rng(seed).normal(0.0, 0.08, v.shape)
        with torch.no_grad():
            v.copy_(torch.from_numpy(vals.astype(np.float32)))

    params = convert_reference_state_dict(sd, cfg, strict=True)

    model = KeypointNeRF(cfg)
    sample = make_sample(SyntheticConfig(image_size=32), seed=0)
    vb = ViewBatch(**jax.tree.map(jnp.asarray, sample))
    out = model.apply(params, vb, False)  # eval render of the full 32x32 grid
    img = np.asarray(out["rgb_fine"], np.float64)
    acc = np.asarray(out["acc_fine"], np.float64)
    assert img.shape == (32, 32, 3)
    got = np.array([
        img.mean(), img.std(),
        img[16, 20, 0], img[16, 20, 1], img[16, 20, 2], img[14, 18, 1],
        acc.mean(),
    ])
    golden = np.array(GOLDEN_IMPORT_RENDER)
    np.testing.assert_allclose(got, golden, rtol=2e-3, atol=2e-5,
                               err_msg=f"got {got.tolist()}")


# committed goldens for test_full_import_render_golden (f32 CPU eval render;
# regenerate ONLY for an intentional semantics change, never to paper over a
# converter drift): [img mean, img std, 3 pixels, acc mean]
GOLDEN_IMPORT_RENDER = [0.003172187, 0.0349091355, 0.3886003792, 0.3258670568,
                        0.3861274123, 0.0018059127, 0.0085666297]
