"""Declarative bulk load (Embulk parity).

Parity: ``EmbulkOperator`` (reference ``operators/embulk.py:8-24``) shells
out to the Embulk JVM bulk loader with a YAML config — "mainly used to load
data from a csv file to a Postgres table" (``embulk.py:14-15``). Spark *is*
a parallel bulk loader, so the YAML config becomes a :class:`LoadSpec`
(format + options + schema + target) and the load is
``spark.read.format(...).load(...)`` → ``saveAsTable`` — input splits give
the parallelism Embulk got from its executor threads, with no subprocess.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from data_preparation_plugin_spark.dataset import Dataset
from data_preparation_plugin_spark.operators.base import BaseOperator


@dataclass
class LoadSpec:
    """Declarative load config — the engine's equivalent of an Embulk YAML.

    ``schema`` is a DDL string (``"a INT, b STRING"``) or None to infer.
    ``options`` go straight to the DataFrameReader (header, sep, nullValue,
    timestampFormat, ...). ``partition_by`` controls output layout — the
    scale lever the reference delegated to Postgres indexes.
    """

    path: str
    table: str
    db_schema: str | None = None
    format: str = "csv"
    schema: str | None = None
    options: dict[str, str] = field(default_factory=dict)
    mode: str = "overwrite"
    partition_by: tuple[str, ...] = ()

    #: Embulk column type -> Spark DDL type (Embulk's public type system:
    #: boolean, long, double, string, timestamp, json).
    _EMBULK_TYPES = {
        "boolean": "BOOLEAN",
        "long": "BIGINT",
        "double": "DOUBLE",
        "string": "STRING",
        "timestamp": "TIMESTAMP",
        "json": "STRING",
    }

    #: Ruby strftime directive -> Spark datetime pattern (the subset Embulk
    #: configs actually use).
    _STRFTIME = {
        "%Y": "yyyy", "%m": "MM", "%d": "dd",
        "%H": "HH", "%M": "mm", "%S": "ss", "%N": "SSSSSSSSS",
        "%z": "XX", "%Z": "zz", "%%": "%",
    }

    @classmethod
    def _strftime_to_spark(cls, pattern: str) -> str:
        """Translate a Ruby strftime pattern in a single left-to-right pass.

        Sequential ``str.replace`` over the directive table mangled escaped
        literals: ``%%Y`` had its ``%Y`` substituted first, yielding
        ``%yyyy`` instead of the literal ``%Y``. Scanning ``%`` tokens once
        consumes ``%%`` before any directive can match inside it.
        """
        import re

        def _sub(match: "re.Match[str]") -> str:
            token = match.group(0)
            if token == "%%":
                return "%"
            if token in cls._STRFTIME:
                return cls._STRFTIME[token]
            raise ValueError(
                f"Unsupported strftime directive {token!r} in Embulk "
                f"timestamp format {pattern!r}"
            )

        return re.sub(r"%.", _sub, pattern)

    @classmethod
    def from_embulk_yaml(cls, config: str, table: str | None = None) -> "LoadSpec":
        """Build a :class:`LoadSpec` from an Embulk YAML config.

        Accepts the config text or a path to it. Supports the file-input
        CSV/JSON parser surface the reference's ``EmbulkOperator`` runs
        (``operators/embulk.py:8-24`` shells out to ``embulk run`` on such
        a file): ``path_prefix``, delimiter/quote/escape/null_string,
        ``skip_header_lines``, typed ``columns`` (becoming an explicit
        Spark schema — no inference pass), and the output table/schema/
        mode (``replace`` → overwrite, ``insert`` → append).
        """
        import os

        import yaml

        if "\n" not in config and os.path.exists(config):
            with open(config) as fh:
                cfg = yaml.safe_load(fh)
        else:
            cfg = yaml.safe_load(config)

        src = cfg.get("in", {})
        parser = src.get("parser", {})
        out = cfg.get("out", {})

        fmt = {"csv": "csv", "json": "json", "jsonl": "json"}.get(
            parser.get("type", "csv"), parser.get("type", "csv")
        )
        options: dict[str, str] = {}
        if fmt == "csv":
            if "delimiter" in parser:
                options["sep"] = str(parser["delimiter"])
            if "quote" in parser:
                options["quote"] = str(parser["quote"])
            if "escape" in parser:
                options["escape"] = str(parser["escape"])
            if "null_string" in parser:
                options["nullValue"] = str(parser["null_string"])
            skip = int(parser.get("skip_header_lines", 0) or 0)
            if skip > 1:
                # Spark's header=true skips exactly one line per file;
                # silently mapping 2+ would turn extra header lines into
                # data rows.
                raise ValueError(
                    f"skip_header_lines={skip} is not representable: Spark "
                    "CSV skips at most one header line per file. Strip the "
                    "extra lines upstream or preprocess the files."
                )
            if skip == 1:
                options["header"] = "true"

        schema = None
        columns = parser.get("columns") or []
        if columns:
            parts = []
            for col in columns:
                ddl = cls._EMBULK_TYPES.get(col.get("type", "string"), "STRING")
                parts.append(f"`{col['name']}` {ddl}")
                if col.get("type") == "timestamp" and col.get("format"):
                    options.setdefault(
                        "timestampFormat", cls._strftime_to_spark(col["format"])
                    )
            schema = ", ".join(parts)

        path = src.get("path_prefix", src.get("path", ""))
        if path and "*" not in path and not os.path.isfile(path):
            # Embulk's path_prefix matches every file starting with it.
            path = f"{path}*"

        return cls(
            path=path,
            table=table or out.get("table", "embulk_load"),
            db_schema=out.get("schema"),
            format=fmt,
            schema=schema,
            options=options,
            mode={"replace": "overwrite", "insert": "append"}.get(
                out.get("mode", "replace"), "overwrite"
            ),
        )


class CsvLoadOperator(BaseOperator):
    """Load files into a catalog table per a :class:`LoadSpec`."""

    def __init__(self, spec: LoadSpec, **kwargs) -> None:
        super().__init__(**kwargs)
        self.spec = spec

    def read(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format(self.spec.format).options(**self.spec.options)
        if self.spec.schema:
            reader = reader.schema(self.spec.schema)
        elif self.spec.format == "csv":
            # No declared schema: pay one extra pass to infer, explicitly.
            reader = reader.option("inferSchema", "true")
        return reader.load(self.spec.path)

    def execute(self, spark: SparkSession) -> DataFrame:
        df = self.read(spark)
        dataset = Dataset(self.spec.table, schema=self.spec.db_schema, spark=spark)
        dataset._ensure_database()
        writer = df.write.mode(self.spec.mode).format("parquet")
        if self.spec.partition_by:
            writer = writer.partitionBy(*self.spec.partition_by)
        writer.saveAsTable(dataset.qualified_name)
        return spark.table(dataset.qualified_name)
