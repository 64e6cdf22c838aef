"""Download-and-unzip ingestion.

Parity: ``DownloadUnzipOperator`` (reference ``operators/download.py:8-22``)
runs ``wget {url} -O {tmp}; unzip -o {tmp} -d {dir_path}`` through bash.
Here: stdlib ``urllib`` + ``zipfile`` (no shell), idempotent overwrite like
``unzip -o``, then the extracted files are read by ``spark.read`` directly.
At cluster scale the fetch is a driver-side staging step landing on shared
storage; the parallel work (parsing/loading) happens in the subsequent
Spark read, which is where Embulk sat in the reference stack.
"""

from __future__ import annotations

import tempfile
import urllib.request
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

from data_preparation_plugin_spark.operators.base import BaseOperator


class DownloadUnzipOperator(BaseOperator):
    """Fetch a zip from ``url`` and extract it into ``dir_path``.

    Signature parity with the reference (``url, dir_path, **kwargs``,
    ``operators/download.py:10-13``). ``file://`` URLs are supported, which
    is also how tests exercise the operator hermetically.
    """

    def __init__(self, url: str, dir_path: str, **kwargs) -> None:
        super().__init__(**kwargs)
        self.url = url
        self.dir_path = dir_path

    def execute(self, spark: SparkSession | None = None) -> list[str]:
        """Download + extract; returns the list of extracted file paths."""
        Path(self.dir_path).mkdir(parents=True, exist_ok=True)
        with tempfile.NamedTemporaryFile(suffix=".zip") as tmp:
            with urllib.request.urlopen(self.url) as response:
                while chunk := response.read(1 << 20):
                    tmp.write(chunk)
            tmp.flush()
            with zipfile.ZipFile(tmp.name) as archive:
                archive.extractall(self.dir_path)  # overwrites like unzip -o
                names = archive.namelist()
        return [str(Path(self.dir_path) / n) for n in names]
