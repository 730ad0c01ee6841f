"""XY — paired x/y vectors for plotting, interpolation, and diagnostics
(reference data.go:25-119). Driver-side small-data utility by design: the
reference uses XY for plot inputs and interpolation grids (~10^2 points),
never for row-scale data, so there is nothing to distribute."""

from __future__ import annotations

import bisect
from dataclasses import dataclass, field


@dataclass
class XY:
    x: list[float] = field(default_factory=list)
    y: list[float] = field(default_factory=list)

    def __post_init__(self) -> None:
        if len(self.x) != len(self.y):
            raise ValueError("XY: x and y must have same length")

    def sort(self) -> "XY":
        """Sort in place by x (data.go:60-69)."""
        order = sorted(range(len(self.x)), key=lambda i: self.x[i])
        self.x = [self.x[i] for i in order]
        self.y = [self.y[i] for i in order]
        return self

    def interp(self, x_new: list[float]) -> "XY":
        """Linear interpolation at x_new (data.go:72-100): clamps outside
        the range; exact x hits return the stored y."""
        if len(self.x) != len(self.y):
            raise ValueError("XY.interp: x and y must have same length")
        xs, ys = self.x, self.y
        if any(xs[i] > xs[i + 1] for i in range(len(xs) - 1)):
            self.sort()
            xs, ys = self.x, self.y
        out = []
        for xn in x_new:
            i = bisect.bisect_left(xs, xn)
            if i == len(xs):
                out.append(ys[-1])
            elif xs[i] == xn:
                out.append(ys[i])
            elif i == 0:
                out.append(ys[0])
            else:
                w = (xn - xs[i - 1]) / (xs[i] - xs[i - 1])
                out.append(w * ys[i] + (1.0 - w) * ys[i - 1])
        return XY(x=list(x_new), y=out)


def from_df(df, x_col: str, y_col: str, limit: int = 100_000) -> XY:
    """Collect two columns into an XY (guard-railed: this is a driver-side
    structure — refuse silent multi-GB collects)."""
    n = df.count()
    if n > limit:
        raise ValueError(f"from_df: {n} rows > limit {limit}; aggregate first")
    rows = df.select(x_col, y_col).collect()
    for i, r in enumerate(rows):
        if r[0] is None or r[1] is None:
            bad = x_col if r[0] is None else y_col
            raise ValueError(
                f"from_df: NULL in column {bad!r} at collected row {i} - "
                "filter or fill nulls before interpolation"
            )
    return XY(x=[float(r[0]) for r in rows], y=[float(r[1]) for r in rows])
