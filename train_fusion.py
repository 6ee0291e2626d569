#!/usr/bin/env python
"""Thin shim preserving the reference's ``python train_fusion.py`` surface;
see ``deeplip_tpu/cli/train_fusion.py`` for the real entry point."""

from deeplip_tpu.cli.train_fusion import main

if __name__ == "__main__":
    main()
