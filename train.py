#!/usr/bin/env python
"""Repo-root shim: ``python train.py ...`` (reference-style invocation).
The implementation lives in lpdnet_tpu/cli/train.py; pip installs expose
it as ``lpdnet-train``."""

from lpdnet_tpu.cli.train import main

if __name__ == "__main__":
    main()
