"""Repo-root shim: `python main_al.py ...` as in the reference. The
implementation lives in pixelpick_tpu/cli/main_al.py (installed console
script: `pixelpick-al`)."""
from pixelpick_tpu.cli.main_al import *  # noqa: F401,F403
from pixelpick_tpu.cli.main_al import main

if __name__ == "__main__":
    main()
