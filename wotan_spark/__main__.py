"""``python -m wotan_spark`` — delegate to the pipeline entry point
(the same CLI as scripts/run_pipeline.py; on a cluster:
``spark-submit --py-files wotan_spark.zip -m wotan_spark`` equivalent)."""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from scripts.run_pipeline import main  # noqa: E402

if __name__ == "__main__":
    main()
