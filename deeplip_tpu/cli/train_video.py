"""Video (lipreading) entry point.

Mirrors the reference ``train_video.py`` CLI surface (``load_args``,
``train_video.py:31-68``): JSON model config, npz clip directory, training
hyperparameters, and the embedding-extraction mode that dumps per-clip
``(1, T, 512)`` npz features (``train_video.py:99-106,211-213``).

Usage::

    # train
    python -m deeplip_tpu.cli.train_video --config-path conf/video_config.json \
        --data-dir data/video_npz --epochs 10 --batch-size 45

    # offline per-clip embedding extraction (for the fusion back-ends)
    python -m deeplip_tpu.cli.train_video --config-path conf/video_config.json \
        --data-dir data/video_npz --extract-feats \
        --model-path exp/<t>/net_10 --mouth-embedding-out-path data/embedding
"""

from __future__ import annotations

import argparse

from deeplip_tpu.core.config import load_video_config
from deeplip_tpu.data.video_dataset import VideoClipBatches, scan_clip_dir
from deeplip_tpu.train.video import VideoTrainer


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-path", default="conf/video_config.json")
    p.add_argument("--data-dir", required=True, help="npz mouth-ROI clip root")
    p.add_argument("--label-path", default=None,
                   help="speaker label list fixing the class order")
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=45)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--bucket-t", type=int, default=8)
    p.add_argument("--exp-root", default="exp")
    p.add_argument("--log-time", default=None)
    p.add_argument("--model-path", default=None, help="checkpoint to load")
    p.add_argument("--compute-dtype", default="float32",
                   choices=["bf16", "float32"],
                   help="training-step activation dtype (params stay f32; "
                        "bf16 recommended for throughput)")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="train steps fused into one device program "
                        "(lax.scan over stacked same-shape batches)")
    p.add_argument("--extract-feats", action="store_true")
    p.add_argument("--mouth-embedding-out-path", default=None)
    args = p.parse_args(argv)

    cfg = load_video_config(args.config_path)
    labels = None
    if args.label_path:
        labels = [l.strip() for l in open(args.label_path) if l.strip()]
    clips = scan_clip_dir(args.data_dir, labels)
    n_classes = args.num_classes or (max(c.label for c in clips) + 1)

    trainer = VideoTrainer(
        cfg,
        num_classes=n_classes,
        lr=args.lr,
        weight_decay=args.weight_decay,
        exp_root=args.exp_root,
        log_time=args.log_time,
        compute_dtype=args.compute_dtype,
        steps_per_dispatch=args.steps_per_dispatch,
    )
    if args.model_path:
        trainer.load(args.model_path)

    if args.extract_feats:
        batches = VideoClipBatches(
            clips, batch_size=args.batch_size, bucket_t=args.bucket_t,
            shuffle=False, num_workers=args.workers,
            pre_crop=trainer.crop_size,  # eval-exact; 16% less uint8 H2D
        )
        out = trainer.extract_clip_features(batches, args.mouth_embedding_out_path)
        print(f"extracted {len(out)} clip feature arrays")
        return

    batches = VideoClipBatches(
        clips, batch_size=args.batch_size, bucket_t=args.bucket_t,
        num_workers=args.workers,
    )
    trainer.train(batches, epochs=args.epochs)


if __name__ == "__main__":
    main()
