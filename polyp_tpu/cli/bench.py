"""polyp-bench console entry — delegates to the repo-root bench script."""

import runpy
import sys
from pathlib import Path


def main():
    root_bench = Path(__file__).resolve().parents[2] / "bench.py"
    sys.argv[0] = str(root_bench)
    runpy.run_path(str(root_bench), run_name="__main__")


if __name__ == "__main__":
    main()
