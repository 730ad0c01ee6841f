"""Feature-type (FType) metadata layer.

Semantics follow the reference's fields.go (see /root/reference/fields.go:
roles at fields.go:56-64, FParam fields at fields.go:75-96, JSON round-trip
at fields.go:132-286) but the representation is our own: a plain dataclass
tree serialized to JSON so a scoring pipeline can reuse training-time
encodings exactly.

Key semantic contracts preserved:

- Roles: continuous (CTS), categorical (CAT), one-hot (ONE_HOT), embedding
  (EMBED), and EITHER ("resolve later from the data's type").
- Categorical dictionaries (``FParam.levels``) map raw value -> int32 code,
  with codes assigned in **sorted unique value order** (reference ByPtr,
  data.go:703-715) — NOT frequency order (Spark StringIndexer's default).
- Unseen categorical values map to the code of ``FParam.default``
  (gdata.go:186-196).
- Continuous normalization is z-score with persisted location/scale
  (gdata.go:109-116).
"""

from __future__ import annotations

import datetime as _dt
import json
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Iterator


class FRole(str, Enum):
    """Role a field plays in modeling (reference fields.go:56-64)."""

    CTS = "FRCts"
    CAT = "FRCat"
    ONE_HOT = "FROneHot"
    EMBED = "FREmbed"
    EITHER = "FREither"


_KIND_ENCODERS = {
    "string": (str, str),
    "int": (int, int),
    "float": (float, float),
    "date": (
        lambda v: v.isoformat(),
        lambda s: _dt.date.fromisoformat(s),
    ),
    # datetimes must round-trip as datetimes: date.fromisoformat rejects
    # the time component, and a date key would never equal a runtime
    # datetime value anyway
    "datetime": (
        lambda v: v.isoformat(),
        lambda s: _dt.datetime.fromisoformat(s),
    ),
}


def _kind_of(value: Any) -> str:
    if isinstance(value, bool):
        return "int"
    if isinstance(value, str):
        return "string"
    if isinstance(value, int):
        return "int"
    if isinstance(value, float):
        return "float"
    if isinstance(value, _dt.datetime):
        return "datetime"
    if isinstance(value, _dt.date):
        return "date"
    raise TypeError(f"unsupported level key type: {type(value)!r}")


@dataclass
class FParam:
    """Fitted encoding parameters for one field (fields.go:75-96).

    location/scale : z-score parameters for continuous fields.
    default        : value substituted for unseen categorical levels and for
                     missing-side rows in joins (gdata.go:1322-1344).
    levels         : raw value -> int32 code dictionary for categoricals.
    """

    location: float = 0.0
    scale: float = 1.0
    default: Any = None
    levels: dict[Any, int] | None = None

    def to_json_dict(self) -> dict[str, Any]:
        d: dict[str, Any] = {"location": self.location, "scale": self.scale}
        if self.levels is not None:
            kinds = {_kind_of(k) for k in self.levels}
            kind = kinds.pop() if len(kinds) == 1 else "string"
            enc = _KIND_ENCODERS[kind][0]
            d["levels_kind"] = kind
            d["levels"] = [[enc(k), v] for k, v in sorted(self.levels.items(), key=lambda kv: kv[1])]
        if self.default is not None:
            kind = _kind_of(self.default)
            d["default_kind"] = kind
            d["default"] = _KIND_ENCODERS[kind][0](self.default)
        return d

    @classmethod
    def from_json_dict(cls, d: dict[str, Any]) -> "FParam":
        fp = cls(location=d.get("location", 0.0), scale=d.get("scale", 1.0))
        if "levels" in d:
            dec = _KIND_ENCODERS[d.get("levels_kind", "string")][1]
            fp.levels = {dec(k): int(v) for k, v in d["levels"]}
        if "default" in d:
            dec = _KIND_ENCODERS[d.get("default_kind", "string")][1]
            fp.default = dec(d["default"])
        return fp


@dataclass
class FType:
    """Metadata for one field (fields.go:99-129)."""

    name: str
    role: FRole = FRole.EITHER
    cats: int = 0
    embed_cols: int = 0
    normalized: bool = False
    from_field: str = ""
    fp: FParam = field(default_factory=FParam)

    def to_json_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "role": self.role.value,
            "cats": self.cats,
            "embed_cols": self.embed_cols,
            "normalized": self.normalized,
            "from_field": self.from_field,
            "fp": self.fp.to_json_dict(),
        }

    @classmethod
    def from_json_dict(cls, d: dict[str, Any]) -> "FType":
        return cls(
            name=d["name"],
            role=FRole(d.get("role", "FREither")),
            cats=d.get("cats", 0),
            embed_cols=d.get("embed_cols", 0),
            normalized=d.get("normalized", False),
            from_field=d.get("from_field", ""),
            fp=FParam.from_json_dict(d.get("fp", {})),
        )


class FTypes:
    """Ordered collection of FType, keyed by field name (fields.go:30-53)."""

    def __init__(self, fts: list[FType] | None = None):
        self._by_name: dict[str, FType] = {}
        for ft in fts or []:
            self.add(ft)

    def add(self, ft: FType) -> None:
        self._by_name[ft.name] = ft

    def get(self, name: str) -> FType | None:
        return self._by_name.get(name)

    def drop(self, name: str) -> None:
        self._by_name.pop(name, None)

    def names(self) -> list[str]:
        return list(self._by_name)

    def __contains__(self, name: str) -> bool:
        return name in self._by_name

    def __iter__(self) -> Iterator[FType]:
        return iter(self._by_name.values())

    def __len__(self) -> int:
        return len(self._by_name)

    def copy(self) -> "FTypes":
        out = FTypes()
        for ft in self:
            out.add(
                FType(
                    name=ft.name,
                    role=ft.role,
                    cats=ft.cats,
                    embed_cols=ft.embed_cols,
                    normalized=ft.normalized,
                    from_field=ft.from_field,
                    fp=FParam(
                        location=ft.fp.location,
                        scale=ft.fp.scale,
                        default=ft.fp.default,
                        levels=dict(ft.fp.levels) if ft.fp.levels is not None else None,
                    ),
                )
            )
        return out

    def subset(self, names: list[str]) -> "FTypes":
        return FTypes([self._by_name[n] for n in names if n in self._by_name])

    # -- JSON round-trip (contract of fields.go:132-286) --------------------
    def to_json(self) -> str:
        return json.dumps([ft.to_json_dict() for ft in self], indent=1)

    @classmethod
    def from_json(cls, text: str) -> "FTypes":
        return cls([FType.from_json_dict(d) for d in json.loads(text)])

    def save(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "FTypes":
        with open(path, encoding="utf-8") as fh:
            return cls.from_json(fh.read())
