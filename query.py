"""Repo-root shim for pixelpick_tpu/cli/query.py (console script:
`pixelpick-query`)."""
from pixelpick_tpu.cli.query import *  # noqa: F401,F403
from pixelpick_tpu.cli.query import main

if __name__ == "__main__":
    main()
