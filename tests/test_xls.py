"""XLS ingest on REAL bytes (reference extract.py:55-80): the
vendored pure-Python BIFF8 writer generates fixtures, the reader
decodes them, and ``read_xls_many`` runs the decode distributed via
mapInPandas — then the decoded frame flows through the reference
transform, proving a user of the reference's XLS→load pipeline can
run it here end to end with no Excel engine installed."""

from __future__ import annotations

import os
import struct

import pytest

from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from website_traffic_etl_gcp_spark.operators import traffic as traffic_ops
from website_traffic_etl_gcp_spark.sources import readers
from website_traffic_etl_gcp_spark.sources.xls_minimal import (
    XlsFormatError,
    _decode_rk,
    read_xls,
    write_xls,
)

TRAFFIC_SCHEMA = StructType(
    [
        StructField("time", StringType()),
        StructField("traffic", DoubleType()),
    ]
)


def test_write_read_round_trip(tmp_path):
    p = str(tmp_path / "t.xls")
    header = ["Time", "Traffic", "Note"]
    rows = [
        ["24/12/23 10:30:00", 1500.0, "peak"],
        ["01/01/24", 900.5, None],
        ["31/02/24", 0.0, "invalid date kept as text"],
    ]
    write_xls(p, header, rows)
    h, r = read_xls(p)
    assert h == header
    assert r == rows


def test_read_xls_many_decodes_distributed(spark, tmp_path):
    """One file per task row through mapInPandas; column names
    normalize to lower case like the reference's frame handling."""
    paths = []
    for i in range(3):
        p = str(tmp_path / f"drop_{i}.xls")
        write_xls(
            p,
            ["TIME", "TRAFFIC"],
            [[f"0{i + 1}/06/2024 00:00:00", float(100 * i + 5)]],
        )
        paths.append(p)
    df = readers.read_xls_many(spark, paths, TRAFFIC_SCHEMA)
    rows = {(r["time"], r["traffic"]) for r in df.collect()}
    assert rows == {
        ("01/06/2024 00:00:00", 5.0),
        ("02/06/2024 00:00:00", 105.0),
        ("03/06/2024 00:00:00", 205.0),
    }


def test_xls_feeds_reference_transform(spark, tmp_path):
    """Reference parity end to end: XLS bytes → decode → day-first
    parse → ISO timestamps + created_at, invalid dates dropped
    (reference transform.py:55-63)."""
    p = str(tmp_path / "traffic.xls")
    write_xls(
        p,
        ["Time", "Traffic"],
        [
            ["24/12/23 10:30:00", 1500.0],
            ["31/02/2024 00:00:00", 7.0],  # impossible date → dropped
            ["05/01/2024", 42.0],
        ],
    )
    raw = readers.read_xls_many(spark, [p], TRAFFIC_SCHEMA)
    out = traffic_ops.transform(raw, fixed_ts="2024-01-01 00:00:00")
    got = {(r["time"], r["traffic"]) for r in out.collect()}
    assert got == {
        ("2023-12-24 10:30:00", 1500.0),
        ("2024-01-05 00:00:00", 42.0),
    }
    assert out.columns == ["time", "traffic", "created_at"]


def test_validate_traffic_columns_on_decoded_frame(spark, tmp_path):
    p = str(tmp_path / "bad.xls")
    write_xls(p, ["when", "hits"], [["01/01/24", 1.0]])
    schema = StructType(
        [StructField("when", StringType()), StructField("hits", DoubleType())]
    )
    df = readers.read_xls_many(spark, [p], schema)
    with pytest.raises(readers.ExtractionError, match="Missing columns"):
        readers.validate_traffic_columns(df)


def test_rk_decoding():
    """RK is the packed numeric BIFF cell our writer never emits but
    real producers do: 30-bit int / truncated-double forms, each with
    an optional div-100 flag ([MS-XLS] 2.5.122)."""
    # integer form: value<<2 | 0b10
    assert _decode_rk((1234 << 2) | 2) == 1234.0
    # integer + div100: 123456 → 1234.56
    assert _decode_rk((123456 << 2) | 3) == pytest.approx(1234.56)
    # float form: top 30 bits of an IEEE double
    top = struct.unpack("<Q", struct.pack("<d", 2.5))[0] >> 32
    assert _decode_rk(top & 0xFFFFFFFC) == 2.5
    assert _decode_rk((top & 0xFFFFFFFC) | 1) == pytest.approx(0.025)


def test_reader_rejects_non_ole2(tmp_path):
    p = str(tmp_path / "not.xls")
    with open(p, "wb") as f:
        f.write(b"PK\x03\x04 definitely a zip")
    with pytest.raises(XlsFormatError, match="OLE2"):
        read_xls(p)


def test_fixture_is_a_real_compound_file(tmp_path):
    """Structural honesty: magic, sector shift, FAT self-reference,
    and a directory entry named Workbook — the things any [MS-CFB]
    consumer checks before BIFF parsing starts."""
    p = str(tmp_path / "t.xls")
    write_xls(p, ["a"], [[1.0]])
    data = open(p, "rb").read()
    assert data[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    assert struct.unpack_from("<H", data, 30)[0] == 9  # 512-byte sectors
    # FAT sector 0 marks itself FATSECT
    assert struct.unpack_from("<I", data, 512)[0] == 0xFFFFFFFD
    assert "Workbook".encode("utf-16-le") in data
    assert os.path.getsize(p) % 512 == 0


def test_cfb_v4_rejected_explicitly(tmp_path):
    """Version-4 compound files use 4096-byte sectors whose sector 0
    starts at offset 4096; the reader's 512-byte sector addressing
    would misparse them into a confusing broken-chain error, so it
    must reject the major-version field up front."""
    p = os.path.join(str(tmp_path), "v4.xls")
    write_xls(p, ["A"], [["x"]])
    data = bytearray(open(p, "rb").read())
    struct.pack_into("<H", data, 26, 4)  # header major version → 4
    v4 = os.path.join(str(tmp_path), "v4b.xls")
    open(v4, "wb").write(bytes(data))
    with pytest.raises(XlsFormatError, match="major version 4"):
        read_xls(v4)
