#!/usr/bin/env python
"""Thin shim preserving the reference's ``python train_audio.py`` surface;
see ``deeplip_tpu/cli/train_audio.py`` for the real entry point."""

from deeplip_tpu.cli.train_audio import main

if __name__ == "__main__":
    main()
