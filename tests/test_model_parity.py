"""Numerical parity of model building blocks vs torch oracles with shared
weights: conv padding/dilation/stride conventions, the residual block
contract (identity-activation final norms, post-add leaky_relu), and the
ASPP eval pooling path. Guards pretrained-weight fidelity
(SURVEY.md §7 hard part d)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ucd_tpu.models.resnet import ResidualBlock


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


@pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (1, 2)])
def test_conv_semantics(rng, stride, dilation):
    """flax conv with torch-style padding == F.conv2d(padding=dilation)."""
    from ucd_tpu.models.layers import conv
    x = rng.randn(2, 9, 9, 8).astype(np.float32)
    m = conv(16, 3, stride, dilation)
    variables = m.init(jax.random.key(0), jnp.array(x))
    w = np.asarray(variables["params"]["kernel"])  # HWIO

    ours = np.asarray(m.apply(variables, jnp.array(x)))
    ref = F.conv2d(torch.from_numpy(to_nchw(x)),
                   torch.from_numpy(np.transpose(w, (3, 2, 0, 1))),
                   stride=stride, padding=dilation, dilation=dilation)
    np.testing.assert_allclose(ours, to_nhwc(ref.numpy()), rtol=1e-4,
                               atol=1e-5)


def torch_bottleneck(x, weights, stride, dilation, eps=1e-5):
    """Reference ResidualBlock semantics (modules/residual.py:63-97) from
    the math: 1x1 -> BN+lrelu -> 3x3(stride,dil) -> BN+lrelu -> 1x1 ->
    BN(identity), projection shortcut BN(identity), post-add leaky_relu."""
    def bn(x, p):
        return F.batch_norm(x, torch.from_numpy(p["mean"]),
                            torch.from_numpy(p["var"]),
                            torch.from_numpy(p["scale"]),
                            torch.from_numpy(p["bias"]), training=False,
                            eps=eps)

    def cv(x, w, stride=1, dilation=1, padding=0):
        return F.conv2d(x, torch.from_numpy(np.transpose(w, (3, 2, 0, 1))),
                        stride=stride, padding=padding, dilation=dilation)

    y = cv(x, weights["conv1"]["kernel"])
    y = F.leaky_relu(bn(y, weights["bn1"]["s"]), 0.01)
    y = cv(y, weights["conv2"]["kernel"], stride=stride, dilation=dilation,
           padding=dilation)
    y = F.leaky_relu(bn(y, weights["bn2"]["s"]), 0.01)
    y = cv(y, weights["conv3"]["kernel"])
    y = bn(y, weights["bn3"]["s"])
    res = bn(cv(x, weights["proj_conv"]["kernel"], stride=stride),
             weights["proj_bn"]["s"])
    return F.leaky_relu(y + res, 0.01)


@pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (1, 2)])
def test_bottleneck_block_parity(rng, stride, dilation):
    x = rng.randn(2, 8, 8, 16).astype(np.float32)
    block = ResidualBlock(channels=(8, 8, 32), stride=stride,
                          dilation=dilation)
    variables = block.init(jax.random.key(0), jnp.array(x), False)

    # randomize BN params/stats so the test is not trivially scale-free
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    weights = {}
    for name in ("conv1", "conv2", "conv3", "proj_conv"):
        weights[name] = {"kernel": np.asarray(params[name]["kernel"])}
    for name in ("bn1", "bn2", "bn3", "proj_bn"):
        c = params[name]["bn"]["scale"].shape[0]
        s = {"scale": np.abs(rng.randn(c)).astype(np.float32) + 0.5,
             "bias": rng.randn(c).astype(np.float32),
             "mean": rng.randn(c).astype(np.float32) * 0.1,
             "var": np.abs(rng.randn(c)).astype(np.float32) + 0.5}
        params[name]["bn"]["scale"] = jnp.array(s["scale"])
        params[name]["bn"]["bias"] = jnp.array(s["bias"])
        stats[name]["bn"]["mean"] = jnp.array(s["mean"])
        stats[name]["bn"]["var"] = jnp.array(s["var"])
        weights[name] = {"s": s}

    ours = block.apply({"params": params, "batch_stats": stats},
                       jnp.array(x), False)
    ref = torch_bottleneck(torch.from_numpy(to_nchw(x)), weights, stride,
                           dilation)
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref.numpy()),
                               rtol=1e-3, atol=1e-4)


def test_aspp_eval_pooling_replicate_pad(rng):
    """Eval pooling branch: avg_pool(ps, stride 1) + replicate pad matches
    torch semantics (reference modules/deeplab.py:72-89)."""
    from ucd_tpu.models.deeplab import DeeplabV3
    x = rng.randn(1, 8, 8, 16).astype(np.float32)
    head = DeeplabV3(out_channels=8, hidden_channels=8, pooling_size=4)
    pool = head._global_pooling(jnp.array(x), train=False)
    assert pool.shape == (1, 8, 8, 16)

    ref = F.avg_pool2d(torch.from_numpy(to_nchw(x)), (4, 4), stride=1)
    # torch pad order (l, r, t, b) with the reference's even-size asymmetry
    ref = F.pad(ref, (1, 2, 1, 2), mode="replicate")
    np.testing.assert_allclose(np.asarray(pool), to_nhwc(ref.numpy()),
                               rtol=1e-5, atol=1e-6)

    # train mode: true GAP broadcast
    gap = head._global_pooling(jnp.array(x), train=True)
    np.testing.assert_allclose(np.asarray(gap)[0, 0, 0],
                               x.mean(axis=(0, 1, 2)), rtol=1e-5)


def test_maxpool_stem_parity(rng):
    """Stem maxpool 3x3 s2 p1 matches torch (negative values probe the
    -inf padding semantics)."""
    from flax import linen as nn
    x = -np.abs(rng.randn(1, 9, 9, 4)).astype(np.float32)
    ours = nn.max_pool(jnp.array(x), (3, 3), strides=(2, 2),
                       padding=[(1, 1), (1, 1)])
    ref = F.max_pool2d(torch.from_numpy(to_nchw(x)), 3, stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref.numpy()),
                               rtol=1e-6)


def test_bilinear_upsample_parity(rng):
    """Logit upsampling == torch interpolate(align_corners=False)
    (reference segmentation_module.py:133)."""
    from ucd_tpu.models.segmentation import resize_bilinear
    x = rng.randn(2, 4, 4, 3).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.array(x), (16, 16)))
    ref = F.interpolate(torch.from_numpy(to_nchw(x)), size=(16, 16),
                        mode="bilinear", align_corners=False)
    np.testing.assert_allclose(ours, to_nhwc(ref.numpy()), rtol=1e-4,
                               atol=1e-5)


def torch_identity_block(x, weights, stride, dilation, eps=1e-5):
    """Reference IdentityResidualBlock semantics (modules/residual.py:100-180,
    bottleneck): pre-act bn1+lrelu on the input, proj shortcut from the
    activated tensor, 1x1(stride) -> BN+lrelu -> 3x3(dil) -> BN+lrelu -> 1x1,
    residual add with NO post-add activation."""
    def bn(x, p):
        return F.batch_norm(x, torch.from_numpy(p["mean"]),
                            torch.from_numpy(p["var"]),
                            torch.from_numpy(p["scale"]),
                            torch.from_numpy(p["bias"]), training=False,
                            eps=eps)

    def cv(x, w, stride=1, dilation=1, padding=0):
        return F.conv2d(x, torch.from_numpy(np.transpose(w, (3, 2, 0, 1))),
                        stride=stride, padding=padding, dilation=dilation)

    bn1 = F.leaky_relu(bn(x, weights["bn1"]["s"]), 0.01)
    res = cv(bn1, weights["proj_conv"]["kernel"], stride=stride)
    y = cv(bn1, weights["conv1"]["kernel"], stride=stride)
    y = F.leaky_relu(bn(y, weights["bn2"]["s"]), 0.01)
    y = cv(y, weights["conv2"]["kernel"], dilation=dilation,
           padding=dilation)
    y = F.leaky_relu(bn(y, weights["bn3"]["s"]), 0.01)
    y = cv(y, weights["conv3"]["kernel"])
    return y + res


@pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (1, 2)])
def test_identity_block_parity(rng, stride, dilation):
    from ucd_tpu.models.resnet import IdentityResidualBlock
    x = rng.randn(2, 8, 8, 16).astype(np.float32)
    block = IdentityResidualBlock(channels=(8, 8, 32), stride=stride,
                                  dilation=dilation)
    variables = block.init(jax.random.key(0), jnp.array(x), False)

    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])
    weights = {}
    for name in ("conv1", "conv2", "conv3", "proj_conv"):
        weights[name] = {"kernel": np.asarray(params[name]["kernel"])}
    for name in ("bn1", "bn2", "bn3"):
        c = params[name]["bn"]["scale"].shape[0]
        s = {"scale": np.abs(rng.randn(c)).astype(np.float32) + 0.5,
             "bias": rng.randn(c).astype(np.float32),
             "mean": rng.randn(c).astype(np.float32) * 0.1,
             "var": np.abs(rng.randn(c)).astype(np.float32) + 0.5}
        params[name]["bn"]["scale"] = jnp.array(s["scale"])
        params[name]["bn"]["bias"] = jnp.array(s["bias"])
        stats[name]["bn"]["mean"] = jnp.array(s["mean"])
        stats[name]["bn"]["var"] = jnp.array(s["var"])
        weights[name] = {"s": s}

    ours = block.apply({"params": params, "batch_stats": stats},
                       jnp.array(x), False)
    ref = torch_identity_block(torch.from_numpy(to_nchw(x)), weights, stride,
                               dilation)
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(ref.numpy()),
                               rtol=1e-3, atol=1e-4)


def test_s2d_stem_conv_matches_plain_conv(rng):
    """S2DStemConv (space-to-depth packed 4x4 s1) == plain 7x7 s2 conv with
    the SAME (7,7,C,64) kernel parameter, including the zero-tap boundary
    rows, on even inputs; odd inputs fall back to the plain lowering."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from ucd_tpu.models.resnet import S2DStemConv
    from ucd_tpu.models.layers import conv as plain_conv

    for H, W in [(32, 32), (64, 48), (33, 32)]:
        x = jnp.asarray(rng.randn(2, H, W, 3), jnp.float32)
        s2d = S2DStemConv(features=64)
        v = s2d.init(jax.random.key(0), x)
        y_packed = s2d.apply(v, x)
        ref = plain_conv(64, 7, 2)
        vref = {"params": {"kernel": v["params"]["kernel"]}}
        y_plain = ref.apply(vref, x)
        assert y_packed.shape == y_plain.shape, (H, W)
        np.testing.assert_allclose(np.asarray(y_packed),
                                   np.asarray(y_plain),
                                   rtol=1e-4, atol=1e-5)
