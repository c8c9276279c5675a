#!/usr/bin/env python3
"""spark-submit driver file:
  spark-submit --master local[N] --py-files fortissimo_spark.zip \\
      tools/submit_job.py --input ... --output ...
The engine arrives on executors via the --py-files zip; this file only
forwards to the packaged CLI."""

from fortissimo_spark.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
