"""ShuffleNetV2 trunk weight import: parity vs an independent torch model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _torch_shufflenet_trunk(torch, width_channels=(116, 232, 464, 1024), repeats=(4, 8, 4)):
    """Independent torch trunk with the reference's state_dict layout:
    Sequential(features, conv_last) where each InvertedResidual has the
    banch1/banch2 sequentials (pw/bn/relu/dw/bn/pw/bn/relu etc.)."""
    nn = torch.nn

    def unit(inp, oup, stride):
        class IR(nn.Module):
            def __init__(self):
                super().__init__()
                half = oup // 2
                if stride == 2:
                    self.banch1 = nn.Sequential(
                        nn.Conv2d(inp, inp, 3, stride, 1, groups=inp, bias=False),
                        nn.BatchNorm2d(inp),
                        nn.Conv2d(inp, half, 1, 1, 0, bias=False),
                        nn.BatchNorm2d(half),
                        nn.ReLU(),
                    )
                    bin_ = inp
                else:
                    bin_ = half
                self.banch2 = nn.Sequential(
                    nn.Conv2d(bin_, half, 1, 1, 0, bias=False),
                    nn.BatchNorm2d(half),
                    nn.ReLU(),
                    nn.Conv2d(half, half, 3, stride, 1, groups=half, bias=False),
                    nn.BatchNorm2d(half),
                    nn.Conv2d(half, half, 1, 1, 0, bias=False),
                    nn.BatchNorm2d(half),
                    nn.ReLU(),
                )
                self.stride = stride

            def forward(self, x):
                if self.stride == 1:
                    x1, x2 = x[:, : x.shape[1] // 2], x[:, x.shape[1] // 2:]
                    out = torch.cat((x1, self.banch2(x2)), 1)
                else:
                    out = torch.cat((self.banch1(x), self.banch2(x)), 1)
                b, c, h, w = out.shape
                return (
                    out.view(b, 2, c // 2, h, w).transpose(1, 2).reshape(b, c, h, w)
                )

        return IR()

    class Trunk(nn.Module):
        def __init__(self):
            super().__init__()
            feats = []
            cin = 24
            for cout, reps in zip(width_channels[:-1], repeats):
                for i in range(reps):
                    feats.append(unit(cin, cout, 2 if i == 0 else 1))
                    cin = cout
            conv_last = nn.Sequential(
                nn.Conv2d(cin, width_channels[-1], 1, 1, 0, bias=False),
                nn.BatchNorm2d(width_channels[-1]),
                nn.ReLU(),
            )
            self.trunk = nn.Sequential(nn.Sequential(*feats), conv_last)

        def forward(self, x):
            h = self.trunk(x)
            return h.mean((2, 3))

    return Trunk().eval()


def test_shufflenet_trunk_import_parity():
    torch = pytest.importorskip("torch")
    from deeplip_tpu.interop.torch_import import import_shufflenet_trunk_state_dict
    from deeplip_tpu.models.shufflenetv2 import ShuffleNetV2Trunk

    # shrink widths for test speed (keep the structure; widths must be even)
    widths = (16, 32, 64, 48)
    import deeplip_tpu.models.shufflenetv2 as sv2

    tnet = _torch_shufflenet_trunk(torch, widths)
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)

    params, stats = import_shufflenet_trunk_state_dict(tnet.state_dict())

    orig = sv2._STAGE_CHANNELS[1.0]
    sv2._STAGE_CHANNELS[1.0] = widths
    try:
        model = ShuffleNetV2Trunk(width_mult=1.0)
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 24, 24, 24)).astype(np.float32)  # NHWC
        with torch.no_grad():
            want = tnet(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
        got = model.apply({"params": params, "batch_stats": stats}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)
    finally:
        sv2._STAGE_CHANNELS[1.0] = orig
