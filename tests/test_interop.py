"""Kaldi ark/scp round-trip and torch->flax weight-import parity tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deeplip_tpu.interop.kaldi import KaldiHelper, read_ark, read_scp, write_ark_scp


def test_kaldi_roundtrip_matrix_vector(tmp_path):
    rng = np.random.default_rng(0)
    utt2arr = {
        "utt_a": rng.standard_normal((7, 24)).astype(np.float32),
        "utt_b": rng.standard_normal((3, 24)).astype(np.float32),
        "xv_c": rng.standard_normal(512).astype(np.float32),
    }
    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    write_ark_scp(utt2arr, ark, scp)
    got = dict(read_scp(scp))
    assert set(got) == set(utt2arr)
    for k in utt2arr:
        np.testing.assert_array_equal(got[k], utt2arr[k])
    # sequential ark iteration too
    got_seq = dict(read_ark(ark))
    for k in utt2arr:
        np.testing.assert_array_equal(got_seq[k], utt2arr[k])


def test_kaldi_helper_api(tmp_path):
    rng = np.random.default_rng(1)
    helper = KaldiHelper()
    utt2xv = {"u1": rng.standard_normal(16).astype(np.float32)}
    ark, scp = str(tmp_path / "xv.ark"), str(tmp_path / "xv.scp")
    helper.write_speaker_embedding(utt2xv, ark, scp)
    for vec, utt in helper.read_speaker_embedding(scp):
        np.testing.assert_array_equal(vec, utt2xv[utt])


def test_kaldiio_crosscheck(tmp_path):
    """If kaldiio is installed, our writer must be readable by it."""
    kaldiio = pytest.importorskip("kaldiio")
    rng = np.random.default_rng(2)
    utt2arr = {"u": rng.standard_normal((5, 8)).astype(np.float32)}
    ark, scp = str(tmp_path / "x.ark"), str(tmp_path / "x.scp")
    write_ark_scp(utt2arr, ark, scp)
    with kaldiio.ReadHelper(f"scp:{scp}") as reader:
        for utt, arr in reader:
            np.testing.assert_allclose(arr, utt2arr[utt], atol=1e-6)


def _torch_reference_tdnn(torch, contexts, dims, emb_dim):
    """Independent torch model with the reference's state_dict layout
    (module names tdnn.{i}.context_layer / .bn, fc1/bn1/fc2/bn2)."""
    nn = torch.nn

    class Block(nn.Module):
        def __init__(self, cin, cout, ctx):
            super().__init__()
            k = len(ctx)
            d = (ctx[-1] - ctx[0]) // (k - 1) if k > 1 else 1
            self.context_layer = nn.Conv1d(cin, cout, k, dilation=d)
            self.bn = nn.BatchNorm1d(cout)
            self.act = nn.LeakyReLU(0.2)

        def forward(self, x):
            return self.act(self.bn(self.context_layer(x)))

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            blocks = []
            cin = dims[0]
            for ctx, cout in zip(contexts, dims[1:]):
                blocks.append(Block(cin, cout, ctx))
                cin = cout
            self.tdnn = nn.Sequential(*blocks)
            self.fc1 = nn.Linear(dims[-1] * 2, emb_dim)
            self.bn1 = nn.BatchNorm1d(emb_dim)
            self.act = nn.LeakyReLU(0.2)
            self.fc2 = nn.Linear(emb_dim, emb_dim)
            self.bn2 = nn.BatchNorm1d(emb_dim)

        def extract(self, x):
            h = self.tdnn(x)
            stats = torch.cat([h.mean(2), h.std(2)], 1)
            return self.fc2(self.act(self.bn1(self.fc1(stats))))

    return Net().eval()


def test_torch_import_embedding_parity():
    """Embeddings from imported weights must match torch ≤1e-4 (BASELINE bar)."""
    torch = pytest.importorskip("torch")
    from deeplip_tpu.interop.torch_import import import_speaker_embnet_state_dict
    from deeplip_tpu.models.tdnn import SpeakerEmbNet

    contexts = [[-2, -1, 0, 1, 2], [-2, 0, 2], [-3, 0, 3], [0], [0]]
    dims = [24, 64, 64, 64, 64, 128]
    emb = 32
    tnet = _torch_reference_tdnn(torch, contexts, dims, emb)
    # randomize BN running stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    params, stats = import_speaker_embnet_state_dict(tnet.state_dict(), n_blocks=5)
    model = SpeakerEmbNet(
        contexts=tuple(tuple(c) for c in contexts),
        hidden_dims=tuple(dims[1:]),
        embedding_dim=emb,
        pooling="statistic",
    )
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 80, 24)).astype(np.float32)
    with torch.no_grad():
        want = tnet.extract(torch.tensor(x).transpose(1, 2)).numpy()
    got, _ = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x),
        method=model.extract_embedding,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_embedding_store_kaldi_roundtrip(tmp_path):
    from deeplip_tpu.eval.scoring import EmbeddingStore

    rng = np.random.default_rng(5)
    store = EmbeddingStore()
    for i in range(3):
        store[f"s01/u{i}.wav"] = rng.standard_normal(32).astype(np.float32)
    ark, scp = str(tmp_path / "xv.ark"), str(tmp_path / "xv.scp")
    store.save_kaldi(ark, scp)
    loaded = EmbeddingStore.load_kaldi(scp)
    for k in store.table:
        np.testing.assert_array_equal(loaded[k], store[k])


def test_torch_import_attentive_pooling_parity():
    """Weight import for the attentive-statistics pooling variant."""
    torch = pytest.importorskip("torch")
    from deeplip_tpu.interop.torch_import import import_speaker_embnet_state_dict
    from deeplip_tpu.models.tdnn import SpeakerEmbNet

    contexts = [[-2, -1, 0, 1, 2], [0]]
    dims = [24, 32, 48]
    emb, hid = 16, 8
    nn_t = torch.nn

    class Pool(nn_t.Module):
        def __init__(self):
            super().__init__()
            self.W = nn_t.Parameter(torch.randn(hid, dims[-1]))
            self.b = nn_t.Parameter(torch.randn(1, hid))
            self.v = nn_t.Parameter(torch.randn(hid, 1))
            self.k = nn_t.Parameter(torch.randn(1, 1))

        def forward(self, x):  # x: (B, C, T)
            hidden = torch.relu((self.W @ x).transpose(1, 2) + self.b)
            alpha = torch.softmax(hidden @ self.v + self.k, dim=1)  # (B, T, 1)
            mean = torch.matmul(x, alpha).squeeze(-1)
            std = torch.sqrt(torch.clamp(
                torch.matmul(x * x, alpha).squeeze(-1) - mean * mean, min=0))
            return torch.cat([mean, std], 1)

    tnet = _torch_reference_tdnn(torch, contexts, dims, emb)
    tnet.pooling = Pool()
    tnet.fc1 = torch.nn.Linear(dims[-1] * 2, emb)
    tnet.eval()

    def textract(x):
        h = tnet.tdnn(x)
        stats = tnet.pooling(h)
        return tnet.fc2(tnet.act(tnet.bn1(tnet.fc1(stats))))

    params, stats = import_speaker_embnet_state_dict(tnet.state_dict(), n_blocks=2)
    model = SpeakerEmbNet(
        contexts=tuple(tuple(c) for c in contexts),
        hidden_dims=tuple(dims[1:]),
        embedding_dim=emb,
        pooling="attentive_statistic",
        attention_hidden_size=hid,
    )
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 50, 24)).astype(np.float32)
    with torch.no_grad():
        want = textract(torch.tensor(x).transpose(1, 2)).numpy()
    got, _ = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x),
        method=model.extract_embedding,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_trainer_load_torch_checkpoint(tmp_path):
    """AudioTrainer.load_torch_checkpoint: migration path from reference .pth."""
    torch = pytest.importorskip("torch")
    from deeplip_tpu.core.config import Config
    from deeplip_tpu.core.mesh import make_mesh
    from deeplip_tpu.train.audio import AudioTrainer

    contexts = [[-2, -1, 0, 1, 2], [-2, 0, 2], [0]]
    dims = [24, 32, 32, 64]
    tnet = _torch_reference_tdnn(torch, contexts, dims, 16)
    path = str(tmp_path / "net_ref.pth")
    torch.save({"epoch": 3, "state_dict": tnet.state_dict()}, path)

    cfg = Config({
        "data": {"frames": [30, 40], "python_data_config": {
            "rate": 16000, "feat_type": "mfcc",
            "mfcc": {"n_fft": 512, "num_bin": 26, "num_cep": 24, "energy": True,
                     "normalize": True, "delta": False,
                     "win_len": 0.025, "win_shift": 0.01}}},
        "model": {"arch": "tdnn", "tdnn": {
            "input_dim": 24, "hidden_dim": dims[1:], "context": contexts,
            "tdnn_layers": 3, "embedding_dim": 16, "pooling": "statistic",
            "attention_hidden_size": 8, "bn_first": True}},
        "train": {"type": "sgd", "bs": 8, "lr_decay": 0.1, "lr_decay_step": [10],
                  "epoch": 1, "loss": "LMCL", "scale": 30, "margin": [0.2, 0.2],
                  "sgd": {"init_lr": 0.01, "weight_decay": 0, "momentum": 0.9}},
        "test": {},
    })
    trainer = AudioTrainer(cfg, mesh=make_mesh(), n_spk=4)
    trainer.load_torch_checkpoint(path)
    # embeddings must match torch eval on the same features
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 60, 24)).astype(np.float32)
    with torch.no_grad():
        want = tnet.extract(torch.tensor(x).transpose(1, 2)).numpy()
    got, _ = trainer.model.apply(
        {"params": trainer.state.params["model"],
         "batch_stats": trainer.state.batch_stats["model"]},
        jnp.asarray(x),
        method=trainer.model.extract_embedding,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_fusion_head_checkpoint_import_without_reference_package(tmp_path):
    """Reference fusion checkpoints pickle the WHOLE criterion module
    (train_fusion.py:177-179); without the reference package importable a
    plain torch.load dies on ModuleNotFoundError before any tensor is
    read. load_reference_fusion_checkpoint must still recover the LowFER
    U/V AND the criterion weights via the tolerant unpickler, and
    FusionTrainer.load_torch_fusion_head must wire them into the state."""
    import os
    import sys
    import textwrap

    import torch

    from deeplip_tpu.core.config import Config
    from deeplip_tpu.interop.torch_import import load_reference_fusion_checkpoint
    from deeplip_tpu.train.fusion import FusionTrainer

    d1, d2, o, k, n_spk = 24, 512, 24, 30, 3
    # criterion class from a throwaway module, removed before loading —
    # exactly the "reference package not installed" situation
    mod_path = tmp_path / "refpkg_tmp.py"
    mod_path.write_text(textwrap.dedent("""
        import torch.nn as nn
        class CE(nn.Module):
            def __init__(self, din, n):
                super().__init__()
                self.fc = nn.Linear(din, n)
    """))
    sys.path.insert(0, str(tmp_path))
    try:
        import refpkg_tmp

        crit = refpkg_tmp.CE(3 * d1, n_spk)
        rng = np.random.default_rng(0)
        sd = {"U": torch.tensor(rng.uniform(-1, 1, (d1, k * o)), dtype=torch.float32),
              "V": torch.tensor(rng.uniform(-1, 1, (d2, k * o)), dtype=torch.float32)}
        torch.save({"epoch": 3, "state_dict": sd, "criterion": crit},
                   str(tmp_path / "net_3.pth"))
    finally:
        sys.path.remove(str(tmp_path))
        sys.modules.pop("refpkg_tmp", None)
    os.remove(mod_path)

    head, crit_params = load_reference_fusion_checkpoint(str(tmp_path / "net_3.pth"))
    np.testing.assert_array_equal(head["U"], sd["U"].numpy())
    np.testing.assert_array_equal(head["V"], sd["V"].numpy())
    assert crit_params is not None
    np.testing.assert_allclose(crit_params["fc"]["kernel"],
                               crit.fc.weight.detach().numpy().T)
    np.testing.assert_allclose(crit_params["fc"]["bias"],
                               crit.fc.bias.detach().numpy())

    from tests.test_fusion_e2e import AUDIO_DATA, TINY_AUDIO_MODEL, TINY_VIDEO_CFG

    trainer = FusionTrainer(
        TINY_AUDIO_MODEL, Config(dict(TINY_VIDEO_CFG)), n_spk=n_spk,
        audio_data_opts=AUDIO_DATA, video_hidden_dim=8,
        video_trunk_layers=(1, 1, 1, 1), crop_size=(32, 32),
        exp_root=str(tmp_path), log_time="imp0")
    trainer.init_encoders()
    trainer.load_torch_fusion_head(str(tmp_path / "net_3.pth"))
    np.testing.assert_array_equal(
        np.asarray(trainer.state.params["fusion"]["U"]), sd["U"].numpy())
    np.testing.assert_allclose(
        np.asarray(trainer.state.params["criterion"]["fc"]["kernel"]),
        crit.fc.weight.detach().numpy().T)


def test_kaldi_byte_golden(tmp_path):
    """Verify interop.kaldi against BYTES, not itself: a checked-in ark/scp
    fixture hand-encoded per the Kaldi binary-table spec (the format the
    reference's kaldiio calls parse, `/root/reference/models/audio_models/
    utils.py:176-232`; kaldi-asr `Matrix::Write` + `WriteBasicType`):
    ``<utt> ' ' '\\0' 'B' <'FM '|'FV '> ('\\x04' <int32-LE dim>)* <f4 data>``.
    A wrong-but-self-consistent encoding passes round-trip tests; it cannot
    pass this one. (The kaldiio cross-check above self-skips here.)"""
    import os
    import struct

    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    ark_path = os.path.join(fixtures, "kaldi_golden.ark")
    golden = open(ark_path, "rb").read()

    # 1. the fixture itself re-derives from spec constants (self-validating)
    m1 = np.array([[1.0, -2.5, 3.25], [0.5, 0.0, -1.0]], np.float32)
    v1 = np.array([0.25, -0.5, 1.0, 2.0], np.float32)
    m2 = np.array([[7.0, 0.125]], np.float32)
    want = b""
    want += b"utt1 " + b"\x00BFM " + b"\x04" + struct.pack("<i", 2)
    want += b"\x04" + struct.pack("<i", 3) + m1.astype("<f4").tobytes()
    want += b"spk_a-003 " + b"\x00BFV " + b"\x04" + struct.pack("<i", 4)
    want += v1.astype("<f4").tobytes()
    want += b"utt2 " + b"\x00BFM " + b"\x04" + struct.pack("<i", 1)
    want += b"\x04" + struct.pack("<i", 2) + m2.astype("<f4").tobytes()
    assert golden == want

    # 2. the reader decodes the hand-encoded bytes (sequential ark pass)
    from deeplip_tpu.interop.kaldi import read_ark_entry

    got = dict(read_ark(ark_path))
    assert list(got) == ["utt1", "spk_a-003", "utt2"]
    np.testing.assert_array_equal(got["utt1"], m1)
    np.testing.assert_array_equal(got["spk_a-003"], v1)
    np.testing.assert_array_equal(got["utt2"], m2)

    # 3. the checked-in scp offsets point at the records
    scp_path = os.path.join(fixtures, "kaldi_golden.scp")
    for line in open(scp_path):
        utt, loc = line.split()
        off = int(loc.rsplit(":", 1)[1])
        assert golden[off : off + 2] == b"\x00B"
        np.testing.assert_array_equal(read_ark_entry(ark_path, off), got[utt])

    # 4. the writer byte-reproduces the golden ark exactly
    out_ark = str(tmp_path / "rewrite.ark")
    out_scp = str(tmp_path / "rewrite.scp")
    write_ark_scp({"utt1": m1, "spk_a-003": v1, "utt2": m2}, out_ark, out_scp)
    assert open(out_ark, "rb").read() == golden
    offs = [int(ln.rsplit(":", 1)[1]) for ln in open(out_scp)]
    assert offs == [5, 54, 85]


def test_kaldi_reader_rejects_corrupt_records(tmp_path):
    """Mutated/truncated ark bytes raise clean ValueErrors, never return
    garbage arrays."""
    import struct

    good = (b"u " + b"\x00BFV " + b"\x04" + struct.pack("<i", 2)
            + np.array([1.0, 2.0], "<f4").tobytes())

    def _write(data):
        p = str(tmp_path / "c.ark")
        open(p, "wb").write(data)
        return p

    # bad binary marker
    with pytest.raises(ValueError, match="binary marker"):
        list(read_ark(_write(b"u " + b"\x01BFV " + good[4:])))
    # unknown type token
    with pytest.raises(ValueError, match="type token"):
        list(read_ark(_write(b"u " + b"\x00BXY " + good[6:])))
    # bad dim-size marker
    with pytest.raises(ValueError, match="size marker"):
        list(read_ark(_write(b"u " + b"\x00BFV " + b"\x08"
                             + struct.pack("<i", 2))))
