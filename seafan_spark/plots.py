"""Plot emission for the expression language's plotting functions.

The reference accumulates plotly traces in a module-level figure and
renders HTML (parser.go:1844-1997, consts parser.go:28-58). Same surface
here, headless: traces accumulate as plotly-JSON dicts; ``render`` writes

- ``<file>.json`` — the plotly figure spec (data + layout), and
- ``<file>.html`` — a self-contained page loading plotly.js from the CDN,

so the declared plot surface produces a real artifact instead of a silent
no-op. Trace data is collected driver-side, capped at ``MAX_POINTS`` rows
(plots are human-scale; a 100 TB column should be aggregated/sampled by a
diagnostic first — decile/seg/histogram tables are the scale path).
"""

from __future__ import annotations

import json
import os
from typing import Any

MAX_POINTS = 100_000

COLORS = ("black", "red", "blue", "green", "yellow")  # parser.go:57
MARKERS = ("line", "markers")  # parser.go:58
NORMS = ("count", "counts", "percent", "density")  # histogram, parser.go:1902

# module-level current figure, mirroring the reference's `fig`
_state: dict[str, Any] = {"traces": [], "width": 1200.0, "height": 1200.0}


def new_plot() -> None:
    """Reset the current figure (newPlot, parser.go:1844-1850)."""
    _state["traces"] = []


def set_plot_dim(width: float, height: float) -> None:
    """setPlotDim with the reference's 100..2000 validation
    (parser.go:1975-1997)."""
    if not 100 < width < 2000:
        raise ValueError(f"plot width must be between 100 & 2000, got {width}")
    if not 100 < height < 2000:
        raise ValueError(f"plot height must be between 100 & 2000, got {height}")
    _state["width"] = width
    _state["height"] = height


def add_xy(xs: list, ys: list, marker: str, color: str) -> None:
    """plotXY (parser.go:1862-1900): scatter trace, line|markers mode."""
    marker = marker.lower()
    color = color.lower()
    if marker not in MARKERS:
        raise ValueError(f"line type must be 'line' or 'markers', got {marker}")
    if color not in COLORS:
        raise ValueError(f"color {color} not supported")
    if len(xs) != len(ys):
        raise ValueError(f"plotXY slices not same length: {len(xs)}, {len(ys)}")
    _state["traces"].append(
        {
            "type": "scatter",
            "x": xs,
            "y": ys,
            "name": "Scatter",
            "mode": "markers" if marker == "markers" else "lines",
            # plotly reads marker.color for point traces and line.color
            # for line traces — set both so the choice always applies
            "line": {"color": color},
            "marker": {"color": color},
        }
    )


def add_line(ys: list, marker: str, color: str) -> None:
    """plotLine (parser.go:1852-1860): x = 1..n."""
    add_xy([float(i + 1) for i in range(len(ys))], ys, marker, color)


def add_histogram(xs: list, color: str, norm: str) -> None:
    """histogram (parser.go:1902-1944)."""
    color = color.lower()
    norm = norm.lower()
    if color not in COLORS:
        raise ValueError(f"color {color} not supported")
    if norm not in NORMS:
        raise ValueError(f"unknown density normalization: {norm}")
    histnorm = {"count": "", "counts": ""}.get(norm, norm)
    _state["traces"].append(
        {
            "type": "histogram",
            "x": xs,
            "histnorm": histnorm,
            "marker": {"color": color},
        }
    )


def figure() -> dict[str, Any]:
    return {
        "data": list(_state["traces"]),
        "layout": {"width": _state["width"], "height": _state["height"]},
    }


def render(file_name: str, title: str, xlab: str, ylab: str) -> str:
    """render (parser.go:1946-1973): write the current figure as
    ``<file>.json`` + ``<file>.html``. Empty filename falls back to
    ``$SEAFAN_PLOT_DIR/plot`` (default ``./seafan_plots/plot``) — headless
    stand-in for the reference's browser show. Returns the JSON path."""
    fig = figure()
    fig["layout"].update(
        {
            "title": {"text": title},
            "xaxis": {"title": {"text": xlab}},
            "yaxis": {"title": {"text": ylab}},
        }
    )
    if not file_name:
        out_dir = os.environ.get("SEAFAN_PLOT_DIR", "seafan_plots")
        os.makedirs(out_dir, exist_ok=True)
        file_name = os.path.join(out_dir, "plot")
    base, ext = os.path.splitext(file_name)
    if ext.lower() in (".json", ".html"):
        file_name = base
    json_path = file_name + ".json"
    with open(json_path, "w") as f:
        json.dump(fig, f)
    html = (
        "<!DOCTYPE html><html><head><meta charset=\"utf-8\">"
        "<script src=\"https://cdn.plot.ly/plotly-2.32.0.min.js\"></script>"
        f"</head><body><div id=\"fig\"></div><script>Plotly.newPlot('fig', "
        f"{json.dumps(fig['data'])}, {json.dumps(fig['layout'])});"
        "</script></body></html>"
    )
    with open(file_name + ".html", "w") as f:
        f.write(html)
    return json_path
