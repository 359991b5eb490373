#!/usr/bin/env python
"""Repo-root shim: ``python evaluate.py ...`` (reference-style invocation).
The implementation lives in lpdnet_tpu/cli/evaluate.py; pip installs
expose it as ``lpdnet-evaluate``."""

from lpdnet_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
