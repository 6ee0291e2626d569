"""TCN head weight import: parity vs an independent torch multibranch TCN."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _torch_mb_tcn(torch, cin=16, cout=12, ksizes=(3, 5), levels=2):
    """Independent torch model with the reference's TCN state_dict layout
    (tcn.mb_ms_tcn.network.{L}.cbcr{0,1}_{k} + downsample + relu_final +
    tcn.tcn_output): pad-by-(k-1)d conv, BN, symmetric chomp, PReLU."""
    nn = torch.nn

    class CBCR(nn.Module):
        def __init__(self, ci, co, k, d):
            super().__init__()
            self.pad = (k - 1) * d
            self.conv = nn.Conv1d(ci, co, k, padding=self.pad, dilation=d)
            self.batchnorm = nn.BatchNorm1d(co)
            self.non_lin = nn.PReLU(co)

        def forward(self, x):
            h = self.batchnorm(self.conv(x))
            if self.pad:
                h = h[:, :, self.pad // 2 : -(self.pad // 2)]
            return self.non_lin(h)

    class Block(nn.Module):
        def __init__(self, ci, co, d):
            super().__init__()
            branch = co // len(ksizes)
            for i, k in enumerate(ksizes):
                setattr(self, f"cbcr0_{i}", CBCR(ci, branch, k, d))
            for i, k in enumerate(ksizes):
                setattr(self, f"cbcr1_{i}", CBCR(co, branch, k, d))
            self.downsample = nn.Conv1d(ci, co, 1)
            self.relu_final = nn.PReLU(co)

        def forward(self, x):
            h = torch.cat([getattr(self, f"cbcr0_{i}")(x) for i in range(len(ksizes))], 1)
            h = torch.cat([getattr(self, f"cbcr1_{i}")(h) for i in range(len(ksizes))], 1)
            return self.relu_final(h + self.downsample(x))

    class MBTCN(nn.Module):
        def __init__(self):
            super().__init__()
            mods = []
            ci = cin
            for lvl in range(levels):
                mods.append(Block(ci, cout, 2 ** lvl))
                ci = cout
            self.network = nn.Sequential(*mods)

    class Head(nn.Module):
        def __init__(self):
            super().__init__()

            class Wrap(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.mb_ms_tcn = MBTCN()
                    self.tcn_output = nn.Linear(cout, 5)

            self.tcn = Wrap()

        def forward(self, x):  # x: (B, C, T)
            h = self.tcn.mb_ms_tcn.network(x)
            return self.tcn.tcn_output(h.mean(2))

    return Head().eval()


def test_multibranch_tcn_import_parity():
    torch = pytest.importorskip("torch")
    from deeplip_tpu.interop.torch_import import _import_tcn, _clean_state_dict
    from deeplip_tpu.models.tcn import MultibranchTemporalConvNet
    import flax.linen as nn_flax

    tnet = _torch_mb_tcn(torch)
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
    sd = _clean_state_dict(tnet.state_dict())
    tcn_params, tcn_stats = _import_tcn(sd)

    model = MultibranchTemporalConvNet(num_channels=(12, 12), kernel_sizes=(3, 5))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 20, 16)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = model.apply(
        {"params": tcn_params, "batch_stats": tcn_stats}, jnp.asarray(x)
    )
    with torch.no_grad():
        want = tnet.tcn.mb_ms_tcn.network(torch.tensor(x).transpose(1, 2)).numpy()
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(want, (0, 2, 1)), atol=2e-4
    )

    # classifier import
    head_kernel = sd["tcn.tcn_output.weight"].T
    logits = np.asarray(out).mean(1) @ head_kernel + sd["tcn.tcn_output.bias"]
    with torch.no_grad():
        want_logits = tnet(torch.tensor(x).transpose(1, 2)).numpy()
    np.testing.assert_allclose(logits, want_logits, atol=2e-4)
