#!/usr/bin/env python
"""Compile the Mozilla Public Suffix List into the engine's packaged
lookup table ``pythonql_spark/data/public_suffixes.csv``.

Source: the upstream ``public_suffix_list.dat`` (MPL 2.0, maintained at
https://publicsuffix.org/list/).  This container ships the Debian
``publicsuffix`` package's copy at
``/usr/share/publicsuffix/public_suffix_list.dat``; pass a different
path to compile a newer snapshot.

Output rows: ``kind,labels,suffix`` where

* ``kind`` — ``plain`` (exact rule), ``wild`` (the ``X`` of a ``*.X``
  rule: any single extra label in front of ``X`` is part of the
  suffix), ``exc`` (an ``!rule`` exception: the rule is NOT a public
  suffix despite a covering wildcard);
* ``labels`` — the rule's label count (for ``wild``, the label count
  of ``X``);
* ``suffix`` — the rule in lowercase ASCII.  Unicode (IDN) rules are
  converted to their ACE (punycode) form, matching how hosts appear in
  crawled URLs; rules the IDNA 2003 codec rejects fall back to
  per-label RFC 3492 punycode.

1-label ``plain`` rules are DROPPED: the PSL's implicit default rule
``*`` already assigns every unmatched host a 1-label suffix, so they
change nothing and would bloat the hot membership set by ~1.5k entries.

The output is sorted (kind, labels, suffix) so recompiling the same
snapshot is byte-identical — the emitted SQL must be deterministic
([[spark-pitfalls]]: set-iteration order would otherwise randomize the
query text per process).
"""
from __future__ import annotations

import csv
import sys
from pathlib import Path

DEFAULT_SRC = "/usr/share/publicsuffix/public_suffix_list.dat"
OUT = (Path(__file__).resolve().parent.parent
       / "pythonql_spark" / "data" / "public_suffixes.csv")


def to_ace(rule: str) -> str:
    """Lowercase ACE (punycode) form of a dotted PSL rule."""
    rule = rule.lower().strip(".")
    if rule.isascii():
        return rule
    out = []
    for label in rule.split("."):
        if label.isascii():
            out.append(label)
            continue
        try:
            out.append(label.encode("idna").decode("ascii"))
        except UnicodeError:
            out.append("xn--" + label.encode("punycode").decode("ascii"))
    return ".".join(out)


def compile_psl(src: str) -> list[tuple[str, int, str]]:
    rows: set[tuple[str, int, str]] = set()
    for raw in Path(src).read_text(encoding="utf-8").splitlines():
        line = raw.strip()
        if not line or line.startswith("//"):
            continue
        token = line.split()[0]
        if token.startswith("!"):
            kind, rule = "exc", token[1:]
        elif token.startswith("*."):
            kind, rule = "wild", token[2:]
        elif token == "*":
            continue                       # the implicit default rule
        else:
            kind, rule = "plain", token
        suffix = to_ace(rule)
        labels = suffix.count(".") + 1
        if kind == "plain" and labels == 1:
            continue                       # covered by the default rule
        rows.add((kind, labels, suffix))
    return sorted(rows)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SRC
    rows = compile_psl(src)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    with OUT.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["kind", "labels", "suffix"])
        w.writerows(rows)
    by = {}
    for kind, labels, _ in rows:
        by[(kind, labels)] = by.get((kind, labels), 0) + 1
    print(f"wrote {len(rows)} rules to {OUT}")
    for k in sorted(by):
        print(f"  {k[0]} {k[1]}-label: {by[k]}")


if __name__ == "__main__":
    main()
