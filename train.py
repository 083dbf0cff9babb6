"""Repo-root shim for pixelpick_tpu/cli/train.py (console script:
`pixelpick-train`) — reference train.py:179-254 semantics."""
from pixelpick_tpu.cli.train import *  # noqa: F401,F403
from pixelpick_tpu.cli.train import main

if __name__ == "__main__":
    main()
