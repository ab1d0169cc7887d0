"""CSV export sinks (S6) — the reference's only output format.

The reference writes one header row then appends data rows
(/root/reference/app/controllers/cars_controller.rb:39,263;
car_dealers_controller.rb:37-43,415). Its Shopify header repeats
'Image Src'/'Image Position' 22 times — legal CSV, impossible as DataFrame
column names — so the sheet DataFrames use unique positional names
(shopify.SHOPIFY_COLUMNS) and this sink re-labels on write.

Scale shape: the distributed write is Spark-native (header-less part files +
a one-line header sidecar); `export_single_csv` concatenates driver-side for
the reference-compatible single file — an export utility for sheet-sized
results (10^4-10^6 rows), not a data-plane path.
"""

from __future__ import annotations

import csv
import io
import os

from pyspark.sql import DataFrame

_HEADER_SIDECAR = "_HEADER.csv"


def _header_line(labels: list[str]) -> str:
    buf = io.StringIO()
    csv.writer(buf, lineterminator="\n").writerow(labels)
    return buf.getvalue()


def write_csv(df: DataFrame, path: str, header_labels: list[str] | None = None) -> None:
    """Distributed CSV write with an exact, possibly-duplicated header.

    header_labels: positional labels for the header row (defaults to
    df.columns). Data parts are written header-less; the header goes to a
    `_HEADER.csv` sidecar so duplicate labels round-trip exactly.
    """
    labels = list(header_labels) if header_labels is not None else list(df.columns)
    if len(labels) != len(df.columns):
        raise ValueError(f"{len(labels)} header labels for {len(df.columns)} columns")
    (
        df.write.mode("overwrite")
        .option("header", False)
        .option("emptyValue", "")
        .csv(path)
    )
    with open(os.path.join(path, _HEADER_SIDECAR), "w", encoding="utf-8") as f:
        f.write(_header_line(labels))


def export_single_csv(path: str, out_file: str) -> None:
    """Concatenate a write_csv directory into one reference-shaped CSV file
    (header first, then every part). Driver-side streaming copy."""
    parts = sorted(
        f for f in os.listdir(path) if f.startswith("part-") and f.endswith(".csv")
    )
    with open(out_file, "wb") as out:
        with open(os.path.join(path, _HEADER_SIDECAR), "rb") as h:
            out.write(h.read())
        for p in parts:
            with open(os.path.join(path, p), "rb") as f:
                while True:
                    chunk = f.read(1 << 20)
                    if not chunk:
                        break
                    out.write(chunk)
