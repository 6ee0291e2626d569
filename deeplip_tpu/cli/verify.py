"""Speaker-verification serving CLI over :class:`deeplip_tpu.serve.SpeakerVerifier`.

The reference's verification workflow is offline-only (extract ``.npy``
embeddings, score a trial file — ``/root/reference/train_audio.py:484-544``);
this CLI exposes the same trained model as an enroll/verify/identify
service with persistent state:

    deeplip-verify enroll    -c conf/audio_config.yaml -p profiles/ alice a1.wav a2.wav
    deeplip-verify calibrate -c ... -p profiles/ --trials database/trial_grid_v1.txt --root wavs/
    deeplip-verify cohort    -c ... -p profiles/ impostor1.wav impostor2.wav ...
    deeplip-verify verify    -c ... -p profiles/ alice probe.wav
    deeplip-verify identify  -c ... -p profiles/ probe.wav --top-k 3

State lives under the ``--profiles`` dir: speaker profiles as the
reference-layout npy tree (``serve.ProfileVerifier.save_profiles``), the
calibrated threshold as ``_threshold.json``, and the optional AS-norm
cohort (:mod:`deeplip_tpu.eval.snorm`) as ``_cohort.npz`` — set once with
the ``cohort`` subcommand, applied to every later score/calibration.
Each command prints one JSON line to stdout.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("-c", "--config", required=True,
                   help="audio config yaml (same file the trainer uses)")
    p.add_argument("-p", "--profiles", required=True,
                   help="state dir: profiles npy tree + _threshold.json + _cohort.npz")
    p.add_argument("--checkpoint", default=None,
                   help="orbax dir or reference .pth (dispatch by suffix)")
    p.add_argument("--exp-root", default="exp")


def _make_verifier(args, need_profiles: bool = True):
    from deeplip_tpu.serve import SpeakerVerifier

    v = SpeakerVerifier(args.config, checkpoint=args.checkpoint,
                        exp_root=args.exp_root,
                        threshold=getattr(args, "threshold", None))
    if os.path.isdir(args.profiles):
        v.load_profiles(args.profiles)
    elif need_profiles:
        raise SystemExit(f"profiles dir {args.profiles!r} does not exist")
    tf = os.path.join(args.profiles, "_threshold.json")
    if v.threshold is None and os.path.exists(tf):
        with open(tf) as f:
            v.threshold = float(json.load(f)["threshold"])
    cf = os.path.join(args.profiles, "_cohort.npz")
    if os.path.exists(cf):
        with np.load(cf) as z:
            v.set_cohort(z["cohort"], top_k=int(z["top_k"]))
    return v


def _emit(obj) -> None:
    print(json.dumps(obj))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("enroll", help="enroll SPEAKER from one or more wavs")
    _add_common(pe)
    pe.add_argument("speaker")
    pe.add_argument("wavs", nargs="+")

    pv = sub.add_parser("verify", help="accept/reject PROBE against SPEAKER")
    _add_common(pv)
    pv.add_argument("--threshold", type=float, default=None,
                    help="override the calibrated threshold")
    pv.add_argument("speaker")
    pv.add_argument("wav")

    pi = sub.add_parser("identify", help="rank enrolled speakers for PROBE")
    _add_common(pi)
    pi.add_argument("--top-k", type=int, default=1)
    pi.add_argument("wav")

    pc = sub.add_parser(
        "calibrate",
        help="score a trial list, adopt + persist its EER threshold")
    _add_common(pc)
    pc.add_argument("--trials", required=True, help="reference-format trial file")
    pc.add_argument("--root", default=".", help="dir trial utterance paths are relative to")

    ph = sub.add_parser(
        "cohort",
        help="embed impostor wavs as the AS-norm cohort and persist it")
    _add_common(ph)
    ph.add_argument("--top-k", type=int, default=200,
                    help="adaptive top-K cohort scores per utterance")
    ph.add_argument("wavs", nargs="+")

    args = p.parse_args(argv)
    os.makedirs(args.profiles, exist_ok=True)

    if args.cmd == "enroll":
        v = _make_verifier(args, need_profiles=False)
        v.enroll(args.speaker, list(args.wavs))
        v.save_profiles(args.profiles)
        _emit({"enrolled": args.speaker, "n_utts": len(args.wavs),
               "n_speakers": len(v.profiles)})
    elif args.cmd == "verify":
        v = _make_verifier(args)
        r = v.verify(args.speaker, args.wav)
        _emit({"speaker": r.speaker, "score": r.score,
               "threshold": r.threshold, "accept": r.accept})
    elif args.cmd == "identify":
        v = _make_verifier(args)
        _emit({"ranking": [{"speaker": s, "score": sc}
                           for s, sc in v.identify(args.wav, top_k=args.top_k)]})
    elif args.cmd == "calibrate":
        v = _make_verifier(args, need_profiles=False)
        eer, thr = v.calibrate(args.trials, args.root)
        with open(os.path.join(args.profiles, "_threshold.json"), "w") as f:
            json.dump({"threshold": thr, "eer": eer,
                       "trials": os.path.abspath(args.trials)}, f)
        _emit({"eer": eer, "threshold": thr})
    else:  # cohort
        v = _make_verifier(args, need_profiles=False)
        v.set_cohort_files(list(args.wavs), top_k=args.top_k)
        np.savez(os.path.join(args.profiles, "_cohort.npz"),
                 cohort=v.cohort, top_k=np.asarray(args.top_k))
        _emit({"cohort_size": int(v.cohort.shape[0]), "top_k": args.top_k})


if __name__ == "__main__":
    main()
