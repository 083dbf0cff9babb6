"""Repo-root shim for pixelpick_tpu/cli/eval.py (console script:
`pixelpick-eval`)."""
from pixelpick_tpu.cli.eval import *  # noqa: F401,F403
from pixelpick_tpu.cli.eval import main, evaluate

if __name__ == "__main__":
    main()
