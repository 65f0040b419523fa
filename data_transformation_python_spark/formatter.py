"""Result formatting: rows → JSON / CSV / ASCII table.

Port of the reference formatter (reference: src/framework/
executor.py:455-514; Polars variant polars_utils.py:414-458) over
plain row dicts or a Spark DataFrame (which is sampled with ``limit``,
never fully collected)."""

from __future__ import annotations

import csv
import io
import json


class ResultFormatter:
    @staticmethod
    def format(rows: list[dict], output_format: str = "table", limit: int | None = None) -> str:
        if limit is not None:
            rows = rows[:limit]
        if output_format == "json":
            return json.dumps(rows, default=str, indent=2)
        if output_format == "csv":
            buf = io.StringIO()
            if rows:
                w = csv.DictWriter(buf, fieldnames=list(rows[0].keys()))
                w.writeheader()
                w.writerows(rows)
            return buf.getvalue()
        if output_format == "table":
            return ResultFormatter._ascii_table(rows)
        raise ValueError(f"Unknown format {output_format!r}")

    @staticmethod
    def _ascii_table(rows: list[dict]) -> str:
        if not rows:
            return "(no rows)"
        cols = list(rows[0].keys())
        widths = {
            c: max(len(str(c)), *(len(str(r.get(c))) for r in rows)) for c in cols
        }
        sep = "+" + "+".join("-" * (widths[c] + 2) for c in cols) + "+"
        out = [sep, "|" + "|".join(f" {c:<{widths[c]}} " for c in cols) + "|", sep]
        for r in rows:
            out.append(
                "|" + "|".join(f" {str(r.get(c)):<{widths[c]}} " for c in cols) + "|"
            )
        out.append(sep)
        return "\n".join(out)

    @staticmethod
    def format_df(df, output_format: str = "table", limit: int = 100) -> str:
        """DataFrame variant — samples with ``limit`` so formatting a
        huge result never pulls it to the driver (O3)."""
        rows = [r.asDict() for r in df.limit(limit).collect()]
        return ResultFormatter.format(rows, output_format)
