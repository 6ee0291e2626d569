"""Kaldi x-vector <-> npy embedding-tree conversion commands.

Re-creates the reference Trainer's ``transform_from_kaldi_xv`` /
``transform_to_kaldi_xv`` (``/root/reference/train_audio.py:443-471``) as a
real CLI (the reference hard-codes its authors' cluster paths and is only
callable by editing source):

- ``from-kaldi``: read a Kaldi ``xvector.scp``, remap each vox-style
  utterance id ``spk-rec...-file`` to the path ``spk/rec.../file`` (first
  token = speaker dir, last = file, middle '-'-joined back together —
  ``train_audio.py:447-449``) and save one ``.npy`` per utterance
  (``.wav`` suffix replaced by ``.npy``) under the output tree.

- ``to-kaldi``: read an scp listing of original Kaldi utt ids, remap each
  id to the npy path as above — including the augmented-utterance quirk
  (``train_audio.py:461-466``): ids ending in one of
  ``reverb|music|babble|noise`` map to ``spk/rec/<aug>/<file>`` — load
  ``<xv-root>/<path>.npy`` and write everything as one Kaldi
  ``ark``+``scp`` pair (binary FV/FM records, ``interop.kaldi``).

Usage::

    python -m deeplip_tpu.cli.kaldi_xv from-kaldi --scp xvector.scp \
        --out-dir exp/t/kaldi_test_xv
    python -m deeplip_tpu.cli.kaldi_xv to-kaldi --scp ori_xvector.scp \
        --xv-root exp/t/test_xv --out-prefix exp/t/test
"""

from __future__ import annotations

import argparse
import os
from collections import OrderedDict

import numpy as np

from deeplip_tpu.interop.kaldi import read_scp, write_ark_scp

# reference augment suffixes (train_audio.py:455)
AUGMENT_TYPES = ("reverb", "music", "babble", "noise")


def kaldi_name_to_path(utt_id: str, augment: bool = False) -> str:
    """Vox-style Kaldi utt id -> relative path.

    ``augment=False`` is the unconditional ``spk/rec.../file`` split of
    ``transform_from_kaldi_xv`` (``train_audio.py:446-447``);
    ``augment=True`` adds ``transform_to_kaldi_xv``'s augmented-id branch
    (``train_audio.py:464-467``): ids ending in an augment suffix map to
    ``spk/rec.../aug/file``. The reference applies the branch ONLY in the
    to-kaldi direction — from-kaldi ids come from a clean test scp and
    never carry suffixes."""
    parts = utt_id.split("-")
    if len(parts) < 3:
        # degenerate ids (no recording segment) keep spk/file shape
        return "/".join(parts)
    if augment and parts[-1] in AUGMENT_TYPES:
        # spk-rec...-file-aug  ->  spk/rec.../aug/file
        return "/".join(
            [parts[0], "-".join(parts[1:-2]), parts[-1], parts[-2]])
    return "/".join([parts[0], "-".join(parts[1:-1]), parts[-1]])


def from_kaldi(scp_path: str, out_dir: str) -> int:
    """Kaldi scp -> npy tree. Returns the number of vectors written."""
    n = 0
    for utt_id, xv in read_scp(scp_path):
        rel = kaldi_name_to_path(utt_id)
        dst_dir = os.path.join(out_dir, os.path.dirname(rel))
        os.makedirs(dst_dir, exist_ok=True)
        base = os.path.basename(rel)
        if base.endswith(".wav"):
            base = base[: -len(".wav")] + ".npy"
        else:
            base += ".npy"
        np.save(os.path.join(dst_dir, base), np.asarray(xv))
        n += 1
    return n


def to_kaldi(scp_path: str, xv_root: str, out_prefix: str) -> int:
    """npy tree -> Kaldi ark/scp, ordered by the original scp listing.

    ``scp_path`` lines are ``<ori_utt> <ignored...>`` (the reference reads
    the original Kaldi scp purely for its utterance ids and ordering,
    ``train_audio.py:457-468``)."""
    utt2xv: "OrderedDict[str, np.ndarray]" = OrderedDict()
    with open(scp_path) as f:
        for line in f:
            line = line.rstrip()
            if not line:
                continue
            ori_utt = line.split(" ")[0]
            rel = kaldi_name_to_path(ori_utt, augment=True)
            npy = os.path.join(xv_root, rel + ".npy")
            if not os.path.exists(npy) and rel.endswith(".wav"):
                npy = os.path.join(xv_root, rel[: -len(".wav")] + ".npy")
            utt2xv[ori_utt] = np.load(npy)
    write_ark_scp(utt2xv, out_prefix + "_xvector.ark",
                  out_prefix + "_xvector.scp")
    return len(utt2xv)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    pf = sub.add_parser("from-kaldi", help="Kaldi xvector scp -> npy tree")
    pf.add_argument("--scp", required=True)
    pf.add_argument("--out-dir", required=True)
    pt = sub.add_parser("to-kaldi", help="npy tree -> Kaldi ark/scp")
    pt.add_argument("--scp", required=True,
                    help="original Kaldi scp (utt ids + ordering)")
    pt.add_argument("--xv-root", required=True)
    pt.add_argument("--out-prefix", required=True)
    args = p.parse_args(argv)

    if args.cmd == "from-kaldi":
        n = from_kaldi(args.scp, args.out_dir)
        print(f"wrote {n} npy vectors under {args.out_dir}")
    else:
        n = to_kaldi(args.scp, args.xv_root, args.out_prefix)
        print(f"wrote {n} vectors to {args.out_prefix}_xvector.ark/.scp")


if __name__ == "__main__":
    main()
