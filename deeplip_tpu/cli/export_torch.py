"""Export a deeplip_tpu orbax checkpoint to a reference-format torch .pth.

The outbound half of checkpoint migration (inbound: the ``.pth`` resume
dispatch in the train CLIs): a model trained on TPU with this framework is
handed back to the reference's torch tooling in its own state_dict layout
(``/root/reference/train_audio.py:266-273`` ``Trainer.load``,
``train_fusion.py:180-188``, ``train_video.py:169``). See
:mod:`deeplip_tpu.interop.torch_export` for the container formats.

Usage::

    python -m deeplip_tpu.cli.export_torch audio \
        --checkpoint exp/<t>/net_avg --out net_avg.pth
    python -m deeplip_tpu.cli.export_torch video \
        --checkpoint exp/<t>/net_5 --out 5.pt
    python -m deeplip_tpu.cli.export_torch fusion \
        --checkpoint exp/<t>/net_avg --out net_avg.pth

``--dp-prefix`` adds the ``module.`` DataParallel prefix the reference's
wrapped trainers expect when loading directly.
"""

from __future__ import annotations

import argparse
import os

from deeplip_tpu.interop.torch_export import (
    save_reference_audio_checkpoint,
    save_reference_fusion_checkpoint,
    save_reference_video_checkpoint,
)
from deeplip_tpu.train import checkpoint as ckpt


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kind", choices=["audio", "video", "fusion"])
    p.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint dir, e.g. exp/<t>/net_avg")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--pooling", default="attentive_statistic",
                   choices=["attentive_statistic", "mono_head_attention"],
                   help="reference pooling parameter layout (audio only; "
                        "only read when the model has attention pooling)")
    p.add_argument("--dp-prefix", action="store_true",
                   help="emit module.-prefixed keys (DataParallel container)")
    args = p.parse_args(argv)

    exp_dir, tag = os.path.split(str(args.checkpoint).rstrip("/"))
    tree = ckpt.load_checkpoint(exp_dir, tag)
    epoch = int(tree.get("epoch", 0))

    if args.kind == "audio":
        save_reference_audio_checkpoint(
            args.out, tree["params"]["model"], tree["batch_stats"]["model"],
            epoch=epoch, criterion_params=tree["params"].get("criterion"),
            pooling=args.pooling, data_parallel_prefix=args.dp_prefix)
    elif args.kind == "video":
        save_reference_video_checkpoint(
            args.out, tree["params"], tree["batch_stats"],
            data_parallel_prefix=args.dp_prefix)
    else:
        fusion = tree["params"]["fusion"]
        if "U" not in fusion or "V" not in fusion:
            raise SystemExit(
                "fusion export needs a LowFER head (U/V params); this "
                f"checkpoint's head keys are {sorted(fusion)}")
        save_reference_fusion_checkpoint(
            args.out, fusion, epoch=epoch,
            criterion_params=tree["params"].get("criterion"),
            data_parallel_prefix=args.dp_prefix)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
