#!/usr/bin/env python3
"""Quantizer-margin probe (the SURVEY §6 convention).

Usage: probe_margins.py <verify_out_dir> <sf_dir> <query> [<query> ...]

For each query, takes its oracle SQL (from <verify_out_dir>/oracle_sql.json),
strips every `floor(EXPR*1e6 + 0.5)/1e6` quantizer down to the raw EXPR,
runs the raw SQL in DuckDB against the sf parquet tables, and reports per
output column the minimum distance of EXPR*1e6 + 0.5 to an integer floor
boundary — the margin by which engine noise would have to move the value
before the quantized output flips. Noise scale: |v|*1e-14 (the oracles
replay the identical IEEE op order, so cross-engine drift is tens of ulps,
not summation-reorder scale). A margin >= 100x that is the "probed" bar.
Margins print in VALUE units (grid distance / 1e6 — the SURVEY convention).
"""
import json
import os
import re
import sys

import duckdb
import math

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

QUANT_TAIL = "*1e6 + 0.5"


def strip_round(sql: str) -> str:
    """Replace round(EXPR, n) with (EXPR), paren-matched (4dp oracles)."""
    out = sql
    pos = 0
    while True:
        i = out.find("round(", pos)
        if i < 0:
            break
        depth = 0
        k = i + len("round(") - 1
        while k < len(out):
            if out[k] == "(":
                depth += 1
            elif out[k] == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        inner = out[i + len("round("):k]
        m = re.match(r"^(.*),\s*(\d+)\s*$", inner, re.S)
        if m:
            out = out[:i] + "(" + m.group(1) + ")" + out[k + 1:]
        else:
            pos = i + 6
    return out


def strip_quantizers(sql: str) -> str:
    """Replace floor(EXPR*1e6 + 0.5)/1e6 with (EXPR), paren-matched."""
    out = strip_round(sql)
    while True:
        i = out.find("floor(")
        if i < 0:
            break
        # scan to the matching close paren of floor(
        depth = 0
        j = i + len("floor(") - 1  # at the '('
        k = j
        while k < len(out):
            if out[k] == "(":
                depth += 1
            elif out[k] == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        inner = out[i + len("floor("):k]
        rest = out[k + 1:]
        if inner.rstrip().endswith(QUANT_TAIL) and rest.lstrip().startswith("/1e6"):
            expr = inner.rstrip()[: -len(QUANT_TAIL)]
            rest2 = rest.lstrip()[len("/1e6"):]
            out = out[:i] + "__RAW__(" + expr + ")" + rest2
        else:
            # not a quantizer floor — mask it so the scan advances
            out = out[:i] + "__FLOOR__(" + inner + ")" + out[k + 1:]
    return out.replace("__RAW__", "").replace("__FLOOR__", "floor")


def main():
    vout, sfdir = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:]
    sqls = json.load(open(os.path.join(vout, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    worst_overall = None
    for qspec in queries:
        q, _, dp = qspec.partition(":")
        grid = 10.0 ** int(dp) if dp else 1e6
        if q not in sqls:
            print(f"{q}: no oracle SQL")
            continue
        raw = strip_quantizers(sqls[q])
        try:
            df = con.execute(raw).df()
        except Exception as e:
            print(f"{q}: raw SQL failed: {e}")
            continue
        rows = []
        for c in df.columns:
            col = df[c]
            if not str(col.dtype).startswith("float"):
                continue
            vals = [v for v in col.tolist() if v is not None and not (
                isinstance(v, float) and math.isnan(v))]
            if not vals:
                continue
            margins = []
            for v in vals:
                u = v * grid + 0.5
                fr = u - math.floor(u)
                margins.append(min(fr, 1.0 - fr))
            m = min(margins)
            v_at = vals[margins.index(m)]
            m_val = m / grid  # grid distance -> value units
            noise = abs(v_at) * 1e-14 + 1e-18
            ratio = m_val / noise
            rows.append((c, m_val, v_at, ratio))
            if worst_overall is None or ratio < worst_overall[3]:
                worst_overall = (f"{q}.{c}", m_val, v_at, ratio)
        rows.sort(key=lambda r: r[3])
        head = ", ".join(
            f"{c} margin {m:.2e} at v={v:.6g} ({r:.0f}x noise)" for c, m, v, r in rows[:3])
        ok = all(r[3] >= 100 for r in rows)
        print(f"{q}: {'OK' if ok else 'WEAK'} — {head}")
    if worst_overall:
        c, m, v, r = worst_overall
        print(f"worst: {c} margin {m:.2e} ({r:.0f}x noise)")


if __name__ == "__main__":
    main()
