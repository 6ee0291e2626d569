"""Serving demo: enroll/verify/identify with SpeakerVerifier.

Builds a synthetic corpus, trains nothing (random init — swap in a real
checkpoint via --checkpoint for meaningful scores), calibrates the accept
threshold at the EER operating point of a trial list, then runs the online
API. Usage::

    python examples/verify_demo.py [--device cpu] [--checkpoint exp/<t>/net_avg]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--device", default=None, choices=[None, "cpu"])
    p.add_argument("--checkpoint", default=None)
    args = p.parse_args()
    if args.device == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["JAX_PLATFORM_NAME"] = "cpu"

    import yaml

    from deeplip_tpu.data.manifest import SpeakerManifest
    from deeplip_tpu.data.synthetic import make_audio_corpus, make_trial_list
    from deeplip_tpu.serve import SpeakerVerifier

    root = tempfile.mkdtemp(prefix="deeplip_verify_demo_")
    make_audio_corpus(root, n_spk=4, utts_per_spk=3, duration=1.5)
    manifest = SpeakerManifest.load(os.path.join(root, "manifest.csv"))
    trial_path = os.path.join(root, "trials.txt")
    make_trial_list(trial_path, manifest, n_trials=60)

    cfg = {
        "data": {"test_root": root, "python_data_config": {
            "rate": 16000, "feat_type": "mfcc",
            "mfcc": {"n_fft": 512, "num_bin": 26, "num_cep": 24,
                     "energy": True, "normalize": True, "delta": False,
                     "win_len": 0.025, "win_shift": 0.01}}},
        "model": {"arch": "etdnn" if args.checkpoint else "tdnn",
                  "tdnn": {"input_dim": 24, "hidden_dim": [64, 64, 128],
                           "context": [[-2, -1, 0, 1, 2], [-2, 0, 2], [0]],
                           "tdnn_layers": 3, "embedding_dim": 32,
                           "pooling": "statistic",
                           "attention_hidden_size": 16, "bn_first": True}},
        "train": {"loss": "LMCL"},
        "test": {"bucket_frames": 50, "batch_size": 16},
    }
    cfg_path = os.path.join(root, "audio.yaml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    v = SpeakerVerifier(cfg_path, checkpoint=args.checkpoint,
                        exp_root=os.path.join(root, "exp"))

    eer, thr = v.calibrate(trial_path, root)
    print(f"calibrated: EER {eer * 100:.2f}%  threshold {thr:.4f}")

    spk_utts = {f"spk{i}": [u.path for u in us]
                for i, us in enumerate(manifest.speakers)}
    for name, paths in spk_utts.items():
        v.enroll(name, paths[:2])  # two-utterance enrollment
    print(f"enrolled {len(v.profiles)} speakers")

    probe = spk_utts["spk0"][2]  # held-out utterance of spk0
    r = v.verify("spk0", probe)
    print(f"verify(spk0, spk0/u2): score {r.score:.4f} "
          f"accept={r.accept} (thr {r.threshold:.4f})")
    r2 = v.verify("spk1", probe)
    print(f"verify(spk1, spk0/u2): score {r2.score:.4f} accept={r2.accept}")
    top = v.identify(probe, top_k=2)
    print(f"identify(spk0/u2): {[(n, round(s, 4)) for n, s in top]}")

    out = os.path.join(root, "profiles")
    v.save_profiles(out)
    print(f"profiles saved to {out}")


if __name__ == "__main__":
    main()
