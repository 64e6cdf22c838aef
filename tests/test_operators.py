"""Operator tests (SURVEY.md §2.A #1-4 + transform vocabulary).

The reference has zero operator tests (SURVEY.md §5); these follow its
golden style anyway: small inputs, exact expected outputs.
"""

from __future__ import annotations

import struct
import zipfile

import pytest

from data_preparation_plugin_spark.operators import (
    AggregateOperator,
    ComputeOperator,
    CopyTableOperator,
    CsvLoadOperator,
    DedupOperator,
    DownloadUnzipOperator,
    FilterOperator,
    JoinOperator,
    LoadSpec,
    Pipeline,
    ProjectOperator,
    RegexExtractOperator,
    ShapefileLoadOperator,
    SortLimitOperator,
    SqlOperator,
    UnionOperator,
    WindowOperator,
    read_shapefile,
)
from data_preparation_plugin_spark.operators.multimodal import decode_images
from data_preparation_plugin_spark.operators.shapefile import write_point_shapefile

DB = "opdb"


@pytest.fixture(autouse=True)
def _db(spark):
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{DB}`")
    yield


def _seed_table(spark, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").format(
        "parquet"
    ).saveAsTable(f"`{DB}`.`{name}`")


# -- ingest -----------------------------------------------------------------


def test_download_unzip_operator(tmp_path, spark):
    """Parity: operators/download.py:14-22 (wget + unzip -o), file:// URL."""
    payload = tmp_path / "data.csv"
    payload.write_text("a,b\n1,x\n2,y\n")
    archive = tmp_path / "data.zip"
    with zipfile.ZipFile(archive, "w") as z:
        z.write(payload, arcname="data.csv")
    out_dir = tmp_path / "extracted"
    op = DownloadUnzipOperator(url=archive.as_uri(), dir_path=str(out_dir))
    extracted = op.execute(spark)
    assert extracted == [str(out_dir / "data.csv")]
    # idempotent re-run (unzip -o semantics)
    assert op.execute(spark) == extracted
    assert (out_dir / "data.csv").read_text().startswith("a,b")


def test_csv_load_operator(tmp_path, spark):
    """Parity: operators/embulk.py:8-24 — declarative CSV -> table load."""
    csv = tmp_path / "in.csv"
    csv.write_text("id,name,amount\n1,alpha,10.5\n2,beta,20.25\n")
    spec = LoadSpec(
        path=str(csv),
        table="csv_loaded",
        db_schema=DB,
        schema="id BIGINT, name STRING, amount DOUBLE",
        options={"header": "true"},
    )
    out = CsvLoadOperator(spec).execute(spark)
    assert sorted((r.id, r.name, r.amount) for r in out.collect()) == [
        (1, "alpha", 10.5),
        (2, "beta", 20.25),
    ]


def test_copy_table_operator(spark):
    """Parity: operators/copy.py:7-17 — clone a table."""
    _seed_table(spark, "src", [(1, "a"), (2, "b")], "id LONG, v STRING")
    out = CopyTableOperator(f"{DB}.src", f"{DB}.dst").execute(spark)
    assert sorted((r.id, r.v) for r in out.collect()) == [(1, "a"), (2, "b")]
    # overwrite semantics: DROP + recreate (the -d / DROP TABLE behavior)
    out2 = CopyTableOperator(f"{DB}.src", f"{DB}.dst").execute(spark)
    assert out2.count() == 2


def test_copy_preserves_partition_layout(spark):
    """'INCLUDING indexes' maps to layout: partition columns survive a copy."""
    df = spark.createDataFrame(
        [(1, "x", 2024), (2, "y", 2025)], "id LONG, v STRING, year INT"
    )
    df.write.mode("overwrite").format("parquet").partitionBy("year").saveAsTable(
        f"`{DB}`.`psrc`"
    )
    CopyTableOperator(f"{DB}.psrc", f"{DB}.pdst").execute(spark)
    cols = CopyTableOperator._partition_columns(spark, f"`{DB}`.`pdst`")
    assert cols == ["year"]


# The .shp/.dbf writer lives in the package now (used by the
# source_shapefile_ingest driver query); tests exercise the same code path.
_write_point_shapefile = write_point_shapefile


def test_shapefile_reader_and_operator(tmp_path, spark):
    """Parity: operators/shp2pgsql.py:11-27 — shapefile -> WKT table."""
    base = tmp_path / "pts"
    _write_point_shapefile(
        base, [(1.5, 2.5), (-3.0, 4.0)], [(1, "one"), (2, "two")]
    )
    df = read_shapefile(spark, str(base.with_suffix(".shp")))
    rows = sorted((r.geometry, r.id, r.name) for r in df.collect())
    assert rows == [("POINT (-3 4)", 2, "two"), ("POINT (1.5 2.5)", 1, "one")]

    out = ShapefileLoadOperator(
        str(base.with_suffix(".shp")), f"{DB}.shapes"
    ).execute(spark)
    assert out.count() == 2
    # -d semantics: re-running replaces, not appends
    assert ShapefileLoadOperator(
        str(base.with_suffix(".shp")), f"{DB}.shapes"
    ).execute(spark).count() == 2


def test_shapefile_polygon_roundtrip(tmp_path, spark):
    """Polygon record -> POLYGON WKT with ring."""
    ring = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 0.0)]
    flat = [c for p in ring for c in p]
    content = (
        struct.pack("<i", 5)
        + struct.pack("<4d", 0, 0, 4, 4)
        + struct.pack("<ii", 1, len(ring))
        + struct.pack("<i", 0)
        + struct.pack(f"<{len(flat)}d", *flat)
    )
    records = struct.pack(">ii", 1, len(content) // 2) + content
    header = struct.pack(">iiiiiii", 9994, 0, 0, 0, 0, 0, (100 + len(records)) // 2)
    header += struct.pack("<ii", 1000, 5) + struct.pack("<8d", *([0.0] * 8))
    shp = tmp_path / "poly.shp"
    shp.write_bytes(header + records)
    from data_preparation_plugin_spark.operators.shapefile import _parse_shp

    assert _parse_shp(shp.read_bytes()) == ["POLYGON ((0 0, 4 0, 4 4, 0 0))"]


def _one_record_shp(shape_type: int, body: bytes) -> bytes:
    content = struct.pack("<i", shape_type) + body
    records = struct.pack(">ii", 1, len(content) // 2) + content
    header = struct.pack(
        ">iiiiiii", 9994, 0, 0, 0, 0, 0, (100 + len(records)) // 2
    )
    header += struct.pack("<ii", 1000, shape_type)
    header += struct.pack("<8d", *([0.0] * 8))
    return header + records


def _d(*vals: float) -> bytes:
    return struct.pack(f"<{len(vals)}d", *vals)


_BBOX = _d(0, 0, 9, 9)


def _zm_shape_cases():
    """(shape_type, record body after the type int, expected WKT) for every
    Z/M variant shp2pgsql accepts (reference operators/shp2pgsql.py:13-27)."""
    two_pts = _d(0, 0, 1, 1)  # xy xy
    line_hdr = _BBOX + struct.pack("<ii", 1, 2) + struct.pack("<i", 0)
    two_part_hdr = _BBOX + struct.pack("<ii", 2, 4) + struct.pack("<ii", 0, 2)
    four_pts = _d(0, 0, 1, 1, 5, 5, 6, 6)
    ring = _d(0, 0, 4, 0, 4, 4, 0, 0)
    ring_hdr = _BBOX + struct.pack("<ii", 1, 4) + struct.pack("<i", 0)
    return [
        # PointZ without / with / with-nodata measure
        (11, _d(1, 2, 5), "POINT Z (1 2 5)"),
        (11, _d(1, 2, 5, 9), "POINT ZM (1 2 5 9)"),
        (11, _d(1, 2, 5, -1e40), "POINT Z (1 2 5)"),
        (21, _d(1, 2, 9), "POINT M (1 2 9)"),
        # MultiPointZ: bbox + n + xy*n + zrange + z*n [+ mrange + m*n]
        (
            18,
            _BBOX + struct.pack("<i", 2) + two_pts + _d(1, 2) + _d(1, 2),
            "MULTIPOINT Z (0 0 1, 1 1 2)",
        ),
        (
            18,
            _BBOX + struct.pack("<i", 2) + two_pts + _d(1, 2) + _d(1, 2)
            + _d(7, 8) + _d(7, 8),
            "MULTIPOINT ZM (0 0 1 7, 1 1 2 8)",
        ),
        (
            28,
            _BBOX + struct.pack("<i", 2) + two_pts + _d(7, 8) + _d(7, 8),
            "MULTIPOINT M (0 0 7, 1 1 8)",
        ),
        # PolyLineZ single part -> LINESTRING Z
        (
            13,
            line_hdr + two_pts + _d(1, 2) + _d(1, 2),
            "LINESTRING Z (0 0 1, 1 1 2)",
        ),
        # PolyLineM two parts -> MULTILINESTRING M
        (
            23,
            two_part_hdr + four_pts + _d(1, 4) + _d(1, 2, 3, 4),
            "MULTILINESTRING M ((0 0 1, 1 1 2), (5 5 3, 6 6 4))",
        ),
        # PolygonZ / PolygonM single ring
        (
            15,
            ring_hdr + ring + _d(1, 4) + _d(1, 2, 3, 4),
            "POLYGON Z ((0 0 1, 4 0 2, 4 4 3, 0 0 4))",
        ),
        (
            25,
            ring_hdr + ring + _d(1, 4) + _d(1, 2, 3, 4),
            "POLYGON M ((0 0 1, 4 0 2, 4 4 3, 0 0 4))",
        ),
        # 2D MultiPoint unchanged by the Z/M machinery
        (
            8,
            _BBOX + struct.pack("<i", 2) + two_pts,
            "MULTIPOINT (0 0, 1 1)",
        ),
    ]


@pytest.mark.parametrize(
    "shape_type,body,expected",
    _zm_shape_cases(),
    ids=lambda v: v if isinstance(v, str) else None,
)
def test_shapefile_zm_variants(shape_type, body, expected):
    """Every Z/M shape type round-trips to dimensioned WKT."""
    from data_preparation_plugin_spark.operators.shapefile import _parse_shp

    assert _parse_shp(_one_record_shp(shape_type, body)) == [expected]


def test_shapefile_multipatch_flattens_to_multipolygon():
    """MultiPatch (type 31): a triangle strip plus an outer+inner ring
    pair flatten to the constituent polygons of a MULTIPOLYGON Z — the
    last shape type shp2pgsql accepts (reference shp2pgsql.py:13-27)."""
    from data_preparation_plugin_spark.operators.shapefile import _parse_shp

    # Part 0: triangle strip of 4 points (-> 2 triangles).
    strip = [(0, 0, 1), (0, 2, 1), (2, 0, 1), (2, 2, 1)]
    # Part 1: closed outer square; part 2: closed inner square (hole).
    outer = [(10, 10, 0), (10, 20, 0), (20, 20, 0), (20, 10, 0), (10, 10, 0)]
    inner = [(12, 12, 0), (12, 14, 0), (14, 14, 0), (14, 12, 0), (12, 12, 0)]
    pts = strip + outer + inner
    body = _BBOX
    body += struct.pack("<ii", 3, len(pts))          # NumParts, NumPoints
    body += struct.pack("<3i", 0, 4, 9)              # part start indices
    body += struct.pack("<3i", 0, 2, 3)              # strip, outer, inner
    for x, y, _z in pts:
        body += _d(x, y)
    body += _d(0, 1)                                  # z-range
    body += _d(*[p[2] for p in pts])                  # z values
    [wkt] = _parse_shp(_one_record_shp(31, body))
    assert wkt == (
        "MULTIPOLYGON Z ("
        "((0 0 1, 0 2 1, 2 0 1, 0 0 1)), "
        "((0 2 1, 2 0 1, 2 2 1, 0 2 1)), "
        "((10 10 0, 10 20 0, 20 20 0, 20 10 0, 10 10 0), "
        "(12 12 0, 12 14 0, 14 14 0, 14 12 0, 12 12 0)))"
    )


# -- transforms -------------------------------------------------------------


def test_transform_pipeline_end_to_end(spark):
    """The README's DAG shape (README.md:4-17): load -> filter -> compute ->
    join -> aggregate -> final dataset, run as a Pipeline."""
    _seed_table(
        spark,
        "orders_raw",
        [(1, 10, 120.0), (2, 10, 80.0), (3, 20, 300.0), (4, 30, 50.0)],
        "order_id LONG, cust_id LONG, total DOUBLE",
    )
    _seed_table(
        spark,
        "customers_raw",
        [(10, "ann"), (20, "bo"), (30, "cy")],
        "cust_id LONG, name STRING",
    )
    pipeline = Pipeline(
        [
            FilterOperator(
                "total >= 100.0",
                source=f"{DB}.orders_raw",
                destination=f"{DB}.big_orders",
                task_id="filter",
            ),
            ComputeOperator(
                {"total_with_fee": "round(total * 1.1, 2)"},
                source=f"{DB}.big_orders",
                destination=f"{DB}.big_orders_fee",
                task_id="compute",
            ),
            JoinOperator(
                left=f"{DB}.big_orders_fee",
                right=f"{DB}.customers_raw",
                on=["cust_id"],
                destination=f"{DB}.joined",
                broadcast_right=True,
                task_id="join",
            ),
            AggregateOperator(
                group_by=["name"],
                aggregates={"n": "count(*)", "spend": "sum(total)"},
                source=f"{DB}.joined",
                destination=f"{DB}.final",
                task_id="agg",
            ),
        ]
    )
    results = pipeline.run(spark)
    final = sorted(
        (r.name, r.n, r.spend) for r in results["agg"].collect()
    )
    assert final == [("ann", 1, 120.0), ("bo", 1, 300.0)]


def test_project_and_regex_operators(spark):
    _seed_table(
        spark,
        "cust",
        [(1, "Customer#000000042"), (2, "Customer#000000007")],
        "id LONG, name STRING",
    )
    projected = ProjectOperator(["name"], source=f"{DB}.cust").execute(spark)
    assert projected.columns == ["name"]
    extracted = RegexExtractOperator(
        column="name", pattern=r"#0*(\d+)$", output="num", source=f"{DB}.cust"
    ).execute(spark)
    assert sorted((r.id, r.num) for r in extracted.collect()) == [
        (1, "42"),
        (2, "7"),
    ]


def test_window_dedup_sort_union_sql_operators(spark):
    _seed_table(
        spark,
        "ev",
        [(1, "u1", 5.0), (2, "u1", 7.0), (3, "u2", 1.0), (4, "u1", 7.0)],
        "seq LONG, user STRING, v DOUBLE",
    )
    ranked = WindowOperator(
        partition_by=["user"],
        order_by=["seq"],
        columns={"rn": "row_number()", "running": "sum(v)"},
        source=f"{DB}.ev",
    ).execute(spark)
    got = {(r.seq): (r.rn, r.running) for r in ranked.collect()}
    assert got[1] == (1, 5.0) and got[2] == (2, 12.0) and got[4] == (3, 19.0)

    deduped = DedupOperator(
        keys=["user", "v"], order_by=["seq"], source=f"{DB}.ev"
    ).execute(spark)
    assert sorted(r.seq for r in deduped.collect()) == [1, 2, 3]

    top2 = SortLimitOperator(
        order_by=["v DESC", "seq"], limit=2, source=f"{DB}.ev"
    ).execute(spark)
    assert [r.seq for r in top2.collect()] == [2, 4]

    unioned = UnionOperator([f"{DB}.ev", f"{DB}.ev"]).execute(spark)
    assert unioned.count() == 8
    assert UnionOperator([f"{DB}.ev", f"{DB}.ev"], distinct=True).execute(
        spark
    ).count() == 4

    via_sql = SqlOperator(
        f"SELECT user, count(*) AS n FROM `{DB}`.`ev` GROUP BY user"
    ).execute(spark)
    assert sorted((r.user, r.n) for r in via_sql.collect()) == [
        ("u1", 3),
        ("u2", 1),
    ]


def test_multimodal_decode_stub_raises(spark):
    """Real decoder path is stub-gated: clear error without Pillow."""
    df = spark.createDataFrame([(1, bytearray(b"xx"))], "doc_id LONG, payload BINARY")
    with pytest.raises(Exception) as exc_info:
        decode_images(df).collect()
    assert "Pillow" in str(exc_info.value)


def test_csv_load_permissive_corrupt_records(tmp_path, spark):
    """Malformed CSV rows survive as _corrupt_record instead of failing the
    load — the PERMISSIVE-mode contract an unattended pipeline relies on."""
    from data_preparation_plugin_spark.operators.load import (
        CsvLoadOperator,
        LoadSpec,
    )

    path = tmp_path / "dirty.csv"
    path.write_text("id,qty\n1,10\n2,not_a_number\n3,30\n")
    spec = LoadSpec(
        path=str(path),
        table="t_dirty",
        format="csv",
        schema="id INT, qty INT, _corrupt_record STRING",
        options={
            "header": "true",
            "mode": "PERMISSIVE",
            "columnNameOfCorruptRecord": "_corrupt_record",
        },
    )
    try:
        got = CsvLoadOperator(spec).execute(spark)
        rows = {r.id: (r.qty, r._corrupt_record) for r in got.collect()}
        assert rows[1] == (10, None)
        assert rows[3] == (30, None)
        assert rows[2][0] is None and "not_a_number" in rows[2][1]
    finally:
        spark.sql("DROP TABLE IF EXISTS t_dirty")


def test_embulk_yaml_to_loadspec_and_load(spark, tmp_path):
    """An Embulk file-input CSV config drives a real load end-to-end."""
    from data_preparation_plugin_spark.operators.load import (
        CsvLoadOperator,
        LoadSpec,
    )

    csv = tmp_path / "users_001.csv"
    csv.write_text(
        "id;name;signup\n"
        "1;ada;2024-01-01 10:00:00\n"
        "2;linus;2024-02-03 09:30:00\n"
        "3;NULL;2024-03-05 08:15:00\n"
    )
    config = f"""
in:
  type: file
  path_prefix: {tmp_path}/users_
  parser:
    type: csv
    delimiter: ';'
    null_string: 'NULL'
    skip_header_lines: 1
    columns:
      - {{name: id, type: long}}
      - {{name: name, type: string}}
      - {{name: signup, type: timestamp, format: '%Y-%m-%d %H:%M:%S'}}
out:
  type: postgresql
  table: users_embulk
  mode: replace
"""
    spec = LoadSpec.from_embulk_yaml(config)
    assert spec.format == "csv"
    assert spec.options["sep"] == ";"
    assert spec.options["header"] == "true"
    assert spec.options["nullValue"] == "NULL"
    assert spec.options["timestampFormat"] == "yyyy-MM-dd HH:mm:ss"
    assert spec.schema == "`id` BIGINT, `name` STRING, `signup` TIMESTAMP"
    assert spec.mode == "overwrite"
    assert spec.table == "users_embulk"

    spark.sql("DROP TABLE IF EXISTS users_embulk")
    try:
        got = CsvLoadOperator(spec).execute(spark)
        rows = {r.id: (r.name, str(r.signup)) for r in got.collect()}
        assert rows[1] == ("ada", "2024-01-01 10:00:00")
        assert rows[3][0] is None  # null_string honored
        assert dict(got.dtypes)["id"] == "bigint"
    finally:
        spark.sql("DROP TABLE IF EXISTS users_embulk")


def test_wav_decoder_rejects_malformed():
    """Real-decoder contract: clear errors for non-WAV / non-PCM bytes."""
    from data_preparation_plugin_spark.operators.multimodal import _parse_wav

    with pytest.raises(ValueError, match="RIFF"):
        _parse_wav(b"JUNK" + b"\x00" * 60)
    # Valid RIFF/WAVE wrapper but a compressed (non-PCM) format code.
    import struct

    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36, b"WAVE", b"fmt ", 16, 2, 1, 8000, 16000, 2, 16,
        b"data", 0,
    )
    with pytest.raises(ValueError, match="PCM"):
        _parse_wav(hdr)


def test_wav_roundtrip_stats():
    """Synthesized PCM16 round-trips: header fields + exact sample stats."""
    import struct

    import numpy as np

    from data_preparation_plugin_spark.operators.multimodal import _parse_wav

    samples = np.array([-32768, -1, 0, 1, 32767], dtype="<i2")
    data = samples.tobytes()
    payload = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 1, 1, 8000,
        16000, 2, 16, b"data", len(data),
    ) + data
    rate, ch, bits, got = _parse_wav(payload)
    assert (rate, ch, bits) == (8000, 1, 16)
    assert got.tolist() == samples.tolist()


def test_dhash_known_image():
    """dHash bits computed by hand for a tiny gradient PPM.

    A 2x1 image with left pixel darker than right: after the strided
    resize every sampled column pair compares left<right, so no bit is
    set; flipping the pixels sets every comparison bit. Pins bit order,
    resize indexing, and the channel-sum gray definition.
    """
    import pandas as pd

    from data_preparation_plugin_spark.operators.multimodal import (
        _dhash_ppm_batches,
    )

    def ppm(px):
        return b"P6\n2 1\n255\n" + bytes(px)

    dark_light = ppm([0, 0, 0, 200, 200, 200])   # gray: [0, 600]
    light_dark = ppm([200, 200, 200, 0, 0, 0])   # gray: [600, 0]
    batch = pd.DataFrame(
        {"doc_id": [1, 2], "payload": [dark_light, light_dark]}
    )
    out = pd.concat(list(_dhash_ppm_batches(8, 4)([batch])))
    hashes = dict(zip(out["doc_id"], out["phash"]))
    # Width 2 sampled onto 9 columns: xi = (x*2)//9 -> [0,0,0,0,0,1,1,1,1];
    # adjacent pairs differ only at x=4 (gray[0] vs gray[1]).
    # dark->light: 0 > 600 false everywhere -> no bits.
    assert hashes[1] == 0
    # light->dark: bit set at x=4 of every of the 4 rows: b = y*8 + 4.
    assert hashes[2] == sum(1 << (y * 8 + 4) for y in range(4))


def test_bloom_decontaminate_superset_of_exact(spark):
    """Bloom flags are a superset of the exact contamination set (false
    positives allowed, false negatives never) and counts are >= exact —
    the prescreen contract the docstring states."""
    from data_preparation_plugin_spark.plans.dedup import (
        dedup_bloom_decontaminate,
        dedup_decontaminate,
    )
    from tests.conftest import SF_DIR

    exact = {
        r.doc_id: r.n_contaminated_ngrams
        for r in dedup_decontaminate(spark, SF_DIR).collect()
    }
    bloom = {
        r.doc_id: r.n_flagged_ngrams
        for r in dedup_bloom_decontaminate(spark, SF_DIR).collect()
    }
    assert set(exact) <= set(bloom)
    for doc_id, n in exact.items():
        assert bloom[doc_id] >= n


def test_hierarchy_resolve_sparse_nodes(spark):
    """Pointer doubling must resolve chains whose ancestors are NOT in
    the node set (arithmetic fast-forward), matching a plain Python walk
    — the scale probe caught the 1-step fallback degrading to per-level
    walking on exactly this shape."""
    from data_preparation_plugin_spark.plans.analytics import (
        resolve_hierarchy,
    )

    nodes = [77, 1_000_000, 15, 16, 123_456_789]
    df = spark.createDataFrame([(n,) for n in nodes], "node LONG")
    got = {
        r.node: (r.root, r.depth)
        for r in resolve_hierarchy(df, 16).collect()
    }

    def walk(k):
        d = 0
        while k >= 16:
            k //= 2
            d += 1
        return k, d

    assert got == {n: walk(n) for n in nodes}
