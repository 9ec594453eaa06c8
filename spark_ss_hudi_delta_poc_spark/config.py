"""Layered job configuration — the PySpark replacement for the reference's
Typesafe config stack (Config.scala:5-10 resolving by the ENVIRONMENT env
var over application.conf:1-49).

Resolution order (highest wins):
  1. explicit overrides passed by the caller,
  2. environment variables (NORMV2_<KEY>, upper-case),
  3. the named environment section ("local" / "cloud"),
  4. global defaults.
"""

from __future__ import annotations

import os
from typing import Any

DEFAULTS: dict[str, Any] = {
    "source_format": "csv",  # application.conf:29
    "max_files_per_trigger": 100,
    "header": True,
    "checkpoint_root": "/tmp/normv2/checkpoints",
    "sink_format": "parquet",
    "partition_by": ["Date", "Country"],
    "trigger": "available_now",  # or "processing_time:20 seconds"
}

ENVIRONMENTS: dict[str, dict[str, Any]] = {
    # mirrors the local/emr split of the reference mains
    # (S3ToParquetStreamJob.scala:22-31)
    "local": {
        "profile": "local",
        "source_root": "/tmp/normv2/in",
        "sink_root": "/tmp/normv2/out",
    },
    "cloud": {
        "profile": "cluster",
        "source_root": "s3a://<bucket>/in",
        "sink_root": "s3a://<bucket>/out",
    },
}


def resolve(env: str = "local", **overrides: Any) -> dict[str, Any]:
    if env not in ENVIRONMENTS:
        raise ValueError(f"unknown environment {env!r}; known: {sorted(ENVIRONMENTS)}")
    cfg = dict(DEFAULTS)
    cfg.update(ENVIRONMENTS[env])
    cfg["environment"] = env
    for key in list(cfg):
        env_val = os.environ.get(f"NORMV2_{key.upper()}")
        if env_val is not None:
            current = cfg[key]
            if isinstance(current, bool):
                cfg[key] = env_val.lower() in ("1", "true", "yes")
            elif isinstance(current, int):
                cfg[key] = int(env_val)
            elif isinstance(current, list):
                cfg[key] = env_val.split(",")
            else:
                cfg[key] = env_val
    cfg.update({k: v for k, v in overrides.items() if v is not None})
    return cfg
