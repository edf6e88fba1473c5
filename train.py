#!/usr/bin/env python
"""`python train.py <config.yml>` — reference-compatible training entry point
(/root/reference/train.py:387-393 contract, reimplemented TPU-native in
unet_torch_tpu.cli.train_cli)."""

from unet_torch_tpu.cli.train_cli import main

if __name__ == "__main__":
    main()
