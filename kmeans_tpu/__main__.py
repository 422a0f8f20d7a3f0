"""`python -m kmeans_tpu` == the kmeans-tpu CLI."""

import sys

from kmeans_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
