#!/usr/bin/env python
"""Thin shim preserving the reference's ``python train_video.py`` surface;
see ``deeplip_tpu/cli/train_video.py`` for the real entry point."""

from deeplip_tpu.cli.train_video import main

if __name__ == "__main__":
    main()
