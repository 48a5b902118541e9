"""Schema registry: Table → LocalityGroup → ColumnFamily properties.

Mirrors the reference's three-level schema
(`src/proto/table_schema.proto:17-68`, user API
`include/tera/table_descriptor.h:29-231`) and the teracli schema
string grammar (`doc/en/teracli.md:19-70`):

    table_hello <splitsize=4096,mergesize=512> {
        lg0 <storage=flash, blocksize=8> {
            cf0 <maxversions=3, ttl=0>,
            cf1,
        },
        lg1 { cf2 <maxversions=1, ttl=60> },
    }

In the rebuild these properties drive the current-view builder
(max/min versions, TTL), not physical placement — locality groups map
to Parquet's native columnar layout (SURVEY.md §1.3/§1.5).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field, asdict


@dataclass
class ColumnFamilySchema:
    name: str
    locality_group: str = "lg0"
    max_versions: int = 1
    min_versions: int = 1
    ttl: int = 0          # seconds; <=0 = never expires (table_schema.proto:37-40)
    value_type: str = "bytes"   # bytes | int64_be | int64_le | double | string
    notify: bool = False  # notify=on → observer source CF (table_schema.proto:44)


@dataclass
class LocalityGroupSchema:
    name: str
    storage: str = "disk"     # disk | flash | memory — advisory only in the rebuild
    block_size: int = 4
    compress: str = "snappy"
    use_bloomfilter: bool = False


@dataclass
class TableSchema:
    name: str
    kv_mode: bool = False           # RawKey=GeneralKv/TTLKv
    split_size: int = 512           # MB, advisory → target partition sizing
    merge_size: int = 0
    hash_distribution: bool = False  # murmur-prefixed keys (table_impl.cc:98)
    # pre-split delimiters (CreateTable(desc, delimiters),
    # include/tera/client.h:40-46; teracli createbyfile): sorted row
    # keys marking tablet boundaries — layout jobs align file ranges
    # to them so no file ever spans a delimiter
    delimiters: list[str] = field(default_factory=list)
    locality_groups: dict[str, LocalityGroupSchema] = field(default_factory=dict)
    column_families: dict[str, ColumnFamilySchema] = field(default_factory=dict)

    def add_locality_group(self, name: str, **kw) -> "TableSchema":
        self.locality_groups[name] = LocalityGroupSchema(name=name, **kw)
        return self

    def add_column_family(self, name: str, locality_group: str = "lg0", **kw) -> "TableSchema":
        if locality_group not in self.locality_groups:
            self.add_locality_group(locality_group)
        self.column_families[name] = ColumnFamilySchema(
            name=name, locality_group=locality_group, **kw
        )
        return self

    def cf(self, name: str) -> ColumnFamilySchema:
        return self.column_families[name]

    # --- persistence -----------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(
            {
                "name": self.name,
                "kv_mode": self.kv_mode,
                "split_size": self.split_size,
                "merge_size": self.merge_size,
                "hash_distribution": self.hash_distribution,
                "delimiters": self.delimiters,
                "locality_groups": {k: asdict(v) for k, v in self.locality_groups.items()},
                "column_families": {k: asdict(v) for k, v in self.column_families.items()},
            },
            indent=2,
        )

    @classmethod
    def from_json(cls, s: str) -> "TableSchema":
        d = json.loads(s)
        ts = cls(
            name=d["name"],
            kv_mode=d.get("kv_mode", False),
            split_size=d.get("split_size", 512),
            merge_size=d.get("merge_size", 0),
            hash_distribution=d.get("hash_distribution", False),
            delimiters=d.get("delimiters", []),
        )
        for k, v in d.get("locality_groups", {}).items():
            ts.locality_groups[k] = LocalityGroupSchema(**v)
        for k, v in d.get("column_families", {}).items():
            ts.column_families[k] = ColumnFamilySchema(**v)
        return ts


_PROPS_RE = re.compile(r"<([^>]*)>")
_INT_PROPS = {"maxversions", "minversions", "ttl", "splitsize", "mergesize", "blocksize"}


def _parse_props(s: str | None) -> dict[str, str]:
    if not s:
        return {}
    out = {}
    for kv in s.split(","):
        kv = kv.strip()
        if not kv:
            continue
        k, _, v = kv.partition("=")
        out[k.strip().lower()] = v.strip()
    return out


def parse_schema_string(text: str) -> TableSchema:
    """Parse the teracli schema-string grammar (doc/en/teracli.md:19-70).

    Supports the three forms teracli accepts: full table{lg{cf}} syntax,
    the cf-only shorthand ``t { cf0, cf1 }`` (implicit lg0), and the KV
    form ``kv_table <storage=flash>`` (no braces → kv mode).
    """
    text = text.strip()
    m = re.match(r"^([\w.\-]+)\s*(<[^>]*>)?\s*(\{.*\})?\s*$", text, re.S)
    if not m:
        raise ValueError(f"unparseable schema string: {text!r}")
    name, tprops_s, body = m.group(1), m.group(2), m.group(3)
    tprops = _parse_props(tprops_s[1:-1] if tprops_s else None)
    ts = TableSchema(
        name=name,
        kv_mode=body is None,
        split_size=int(tprops.get("splitsize", 512)),
        merge_size=int(tprops.get("mergesize", 0)),
        # hash key distribution (TableDescriptor::EnableHash, murmur
        # prefix src/sdk/table_impl.cc:98): `t <hash=on> { ... }`
        hash_distribution=tprops.get("hash", "off") in ("on", "true", "1"),
    )
    if body is None:
        # KV mode: single implicit lg
        ts.add_locality_group("lg0", storage=tprops.get("storage", "disk"))
        return ts

    body = body.strip()[1:-1]
    # Does the body contain lg blocks (nested braces) or bare cfs?
    if "{" in body:
        for lg_m in re.finditer(r"([\w\-]+)\s*(<[^>]*>)?\s*\{([^{}]*)\}", body):
            lg_name, lgp_s, cfs = lg_m.group(1), lg_m.group(2), lg_m.group(3)
            lgp = _parse_props(lgp_s[1:-1] if lgp_s else None)
            ts.add_locality_group(
                lg_name,
                storage=lgp.get("storage", "disk"),
                block_size=int(lgp.get("blocksize", 4)),
                compress=lgp.get("compress", "snappy"),
                use_bloomfilter=lgp.get("use_bloomfilter", "false") == "true",
            )
            _add_cfs(ts, cfs, lg_name)
    else:
        ts.add_locality_group("lg0")
        _add_cfs(ts, body, "lg0")
    return ts


def _add_cfs(ts: TableSchema, cfs: str, lg_name: str) -> None:
    for cf_m in re.finditer(r"([\w\-]+)\s*(<[^>]*>)?\s*(?:,|$)", cfs):
        cf_name = cf_m.group(1)
        if not cf_name:
            continue
        p = _parse_props(cf_m.group(2)[1:-1] if cf_m.group(2) else None)
        ts.add_column_family(
            cf_name,
            locality_group=lg_name,
            max_versions=int(p.get("maxversions", 1)),
            min_versions=int(p.get("minversions", 1)),
            ttl=int(p.get("ttl", 0)),
            value_type=p.get("type", "bytes"),
            notify=p.get("notify", "off") == "on",
        )
