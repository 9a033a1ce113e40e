"""Config source (SURVEY §2.1 S9).

The reference fetches decrypted config values by name from a parameter
store (``get_parameter_from_ssm(name) -> str``, ``Utils/S3.py:219-242``;
consumed at ``Lambda/lambda_function.py:45-48`` and
``ec2_deploy/scripts/run.sh:120-154`` for API_KEY / EXPIRATION / BACKFILL).

The Spark-native equivalent is a RESOLUTION LADDER over the places a
cluster job can carry configuration, checked in precedence order:

1. ``spark.conf`` under ``spark.league_of_legends_data_pipeline.<name>`` — survives
   ``spark-submit --conf``, cluster-wide, visible in the Spark UI;
2. process environment ``LEAGUE_OF_LEGENDS_DATA_PIPELINE_<NAME>`` — the container/
   EC2-user-data path the reference's run.sh actually uses;
3. an optional JSON parameter file (``{"name": "value", ...}``) — the
   local stand-in for a managed parameter store.

Values are strings end-to-end, matching the SSM contract. Secrets
management itself (encryption, rotation) is deployment infrastructure and
stays out of engine scope — the engine only defines WHERE a running job
looks, which is the part the reference's pipeline logic depends on.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

CONF_PREFIX = "spark.league_of_legends_data_pipeline."
ENV_PREFIX = "LEAGUE_OF_LEGENDS_DATA_PIPELINE_"


class MissingParameter(KeyError):
    """Raised when a required parameter resolves nowhere (the reference
    lets the boto3 ClientError propagate and aborts the run)."""


def get_parameter(
    spark: SparkSession,
    name: str,
    default: str | None = None,
    param_file: str | None = None,
) -> str:
    """Resolve a named config value: spark.conf > env > parameter file.

    ``name`` is the bare parameter name (e.g. ``"API_KEY"``); each layer
    applies its own namespacing. Raises :class:`MissingParameter` when the
    value resolves nowhere and no ``default`` is given.
    """
    conf_key = CONF_PREFIX + name.lower().replace("_", ".")
    try:
        return spark.conf.get(conf_key)
    except Exception:
        pass
    env_key = ENV_PREFIX + name.upper()
    if env_key in os.environ:
        return os.environ[env_key]
    if param_file and os.path.exists(param_file):
        with open(param_file) as f:
            params = json.load(f)
        if name in params:
            return str(params[name])
    if default is not None:
        return default
    raise MissingParameter(
        f"parameter {name!r} not found in spark.conf ({conf_key}), "
        f"env ({env_key}), or parameter file ({param_file})")
