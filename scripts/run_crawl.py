#!/usr/bin/env python
"""spark-submit entry script: delegates to pyspider_spark.cli.

    spark-submit --py-files pyspider_spark.zip scripts/run_crawl.py \
        crawl --workdir <dfs-path> --rounds 10
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspider_spark.cli import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
