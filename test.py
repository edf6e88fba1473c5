#!/usr/bin/env python
"""`python test.py <config.yml> --checkpoint ...` — standalone evaluation CLI
(replaces the reference's hardcoded-path eval mains; see
unet_torch_tpu/cli/test_cli.py)."""

from unet_torch_tpu.cli.test_cli import main

if __name__ == "__main__":
    main()
