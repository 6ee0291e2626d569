#!/usr/bin/env python
"""Dataset preparation: wav tree → training manifest; videos → mouth-ROI npz.

The reference assumes pre-built manifests/npz trees with hard-coded paths;
this script builds them from standard corpus layouts:

  # audio: <root>/<speaker>/**.wav → manifest CSV (speaker-grouped)
  python scripts/prepare_data.py audio --root data/grid_wav \
      --out data/manifest/train.csv [--resample 16000 --resampled-root data/grid_16k]

  # video: <root>/<speaker>/**.{mpg,mp4,avi} → gray frame npz clips
  python scripts/prepare_data.py video --root data/grid_video --out data/video_npz

Resampling (e.g. GRID's 44.1 kHz stereo → 16 kHz mono) happens offline here,
never in the training hot path.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deeplip_tpu.data.audio_io import read_wav, resample, write_wav  # noqa: E402
from deeplip_tpu.data.manifest import Utterance, write_manifest  # noqa: E402


def prepare_audio(args) -> None:
    speakers = []
    spk_dirs = sorted(d for d in glob.glob(os.path.join(args.root, "*")) if os.path.isdir(d))
    for spk_dir in spk_dirs:
        utts = []
        for wav in sorted(glob.glob(os.path.join(spk_dir, "**", "*.wav"), recursive=True)):
            y, rate = read_wav(wav)
            if args.resample and rate != args.resample:
                y = resample(y, rate, args.resample)
                rate = args.resample
                out_path = os.path.join(
                    args.resampled_root or (args.root + "_resampled"),
                    os.path.relpath(wav, args.root),
                )
                os.makedirs(os.path.dirname(out_path), exist_ok=True)
                write_wav(out_path, y, rate)
                wav = out_path
            utts.append(Utterance(wav, len(y) / rate, rate))
        if utts:
            speakers.append(utts)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    write_manifest(args.out, speakers)
    n = sum(len(s) for s in speakers)
    print(f"wrote {args.out}: {len(speakers)} speakers, {n} utterances")


def prepare_video(args) -> None:
    from deeplip_tpu.data.video_io import cv2_available, extract_video_frames, save2npz

    if not cv2_available():
        raise SystemExit("OpenCV not available for video decode")
    exts = ("*.mpg", "*.mp4", "*.avi", "*.mov")
    count = 0
    for spk_dir in sorted(glob.glob(os.path.join(args.root, "*"))):
        if not os.path.isdir(spk_dir):
            continue
        spk = os.path.basename(spk_dir)
        for ext in exts:
            for vid in sorted(glob.glob(os.path.join(spk_dir, "**", ext), recursive=True)):
                frames = extract_video_frames(vid, to_gray=True)
                if not len(frames):
                    continue
                name = os.path.splitext(os.path.basename(vid))[0]
                save2npz(os.path.join(args.out, spk, name + ".npz"), frames)
                count += 1
    print(f"wrote {count} clips under {args.out}")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    pa = sub.add_parser("audio")
    pa.add_argument("--root", required=True)
    pa.add_argument("--out", required=True)
    pa.add_argument("--resample", type=int, default=None)
    pa.add_argument("--resampled-root", default=None)
    pv = sub.add_parser("video")
    pv.add_argument("--root", required=True)
    pv.add_argument("--out", required=True)
    args = p.parse_args()
    if args.cmd == "audio":
        prepare_audio(args)
    else:
        prepare_video(args)


if __name__ == "__main__":
    main()
