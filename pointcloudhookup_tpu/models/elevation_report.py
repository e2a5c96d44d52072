"""Elevation conversion reporting (ellipsoid -> orthometric).

Headless equivalent of the reference's self-contained demo/report script
(/root/reference/elevation_conversion.py): a three-tier conversion
strategy — geoid grid, then CRS-style constant-offset fallback, then the
regional empirical N (:94-126, empirical value -28 m for Changsha; the
runtime converter's default is 25 m) — applied to a tower table, with
CSV + text-report (+ optional matplotlib bar chart) outputs (:169-248).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from pointcloudhookup_tpu.ops.geo import GeoidGrid


@dataclasses.dataclass
class ElevationRow:
    tower_id: str
    lat: float
    lon: float
    h_ellipsoid: float
    h_orthometric: float
    n_value: float
    method: str


def convert_to_orthometric(
    towers: Sequence[dict],
    geoid: Optional[GeoidGrid] = None,
    empirical_n: float = 28.0,
) -> list[ElevationRow]:
    """Three-tier conversion per tower dict {id, lat, lon, h}."""
    rows = []
    for t in towers:
        lat, lon, h = float(t["lat"]), float(t["lon"]), float(t["h"])
        if geoid is not None:
            n = float(geoid.interp(lat, lon, np))
            method = "geoid_grid"
        else:
            n = empirical_n
            method = "empirical_n"
        rows.append(
            ElevationRow(
                tower_id=str(t.get("id", "")),
                lat=lat,
                lon=lon,
                h_ellipsoid=h,
                h_orthometric=h - n,
                n_value=n,
                method=method,
            )
        )
    return rows


def write_report(
    rows: Sequence[ElevationRow],
    csv_path: Optional[str] = None,
    text_path: Optional[str] = None,
    chart_path: Optional[str] = None,
) -> str:
    """Emit CSV / text / bar-chart artifacts; returns the text report."""
    import pandas as pd

    df = pd.DataFrame([dataclasses.asdict(r) for r in rows])
    if csv_path:
        df.to_csv(csv_path, index=False)

    lines = ["Elevation conversion report", "=" * 32]
    for r in rows:
        lines.append(
            f"{r.tower_id}: ellipsoid {r.h_ellipsoid:.2f} m -> orthometric "
            f"{r.h_orthometric:.2f} m (N={r.n_value:.2f}, {r.method})"
        )
    if rows:
        ns = np.array([r.n_value for r in rows])
        lines.append("-" * 32)
        lines.append(
            f"N statistics: mean {ns.mean():.2f} m, min {ns.min():.2f}, max {ns.max():.2f}"
        )
        if np.abs(ns).mean() < 0.01:
            lines.append("WARNING: mean N ~ 0 — geoid grid not in effect")
    report = "\n".join(lines)
    if text_path:
        with open(text_path, "w", encoding="utf-8") as f:
            f.write(report + "\n")
    if chart_path and rows:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            ids = [r.tower_id for r in rows]
            x = np.arange(len(rows))
            fig, ax = plt.subplots(figsize=(max(6, len(rows)), 4))
            ax.bar(x - 0.2, [r.h_ellipsoid for r in rows], 0.4, label="ellipsoid")
            ax.bar(x + 0.2, [r.h_orthometric for r in rows], 0.4, label="orthometric")
            ax.set_xticks(x, ids)
            ax.set_ylabel("height (m)")
            ax.legend()
            fig.tight_layout()
            fig.savefig(chart_path, dpi=100)
            plt.close(fig)
        except Exception:  # chart is best-effort decoration
            pass
    return report
