"""Registry invariants for __spark_entry__ (no Spark needed): the driver
verifies only the FIRST 50 ``queries()`` entries, so window discipline is
load-bearing — these guards catch a bad rotation before the driver does."""

from __future__ import annotations

import re

import __spark_entry__ as E

SRC = open(E.__file__).read()
DICT_BODY = re.search(r"def queries\(\).*?return \{(.*?)\n    \}", SRC, re.S).group(1)


def _window_keys() -> list[str]:
    keys = []
    for line in DICT_BODY.splitlines():
        if "window ends here" in line:
            break
        m = re.match(r'\s*"((?:q|x)_\w+)"\s*:', line)
        if m:
            keys.append(m.group(1))
    return keys


def test_window_is_exactly_50():
    assert len(_window_keys()) == 50


def test_no_duplicate_registry_keys():
    all_keys = re.findall(r'"((?:q|x)_\w+)"\s*:', DICT_BODY)
    dups = {k for k in all_keys if all_keys.count(k) > 1}
    assert not dups, f"duplicate keys collapse silently in a dict: {dups}"


def test_every_oracle_key_has_a_query():
    qs, os_ = set(E.queries()), set(E.oracle_sql())
    assert os_ <= qs, f"orphan oracle entries: {sorted(os_ - qs)}"


def test_window_q_entries_have_oracles():
    """q_* entries in the driver window must carry an oracle (x_* are the
    deliberate rows-only ones)."""
    os_ = set(E.oracle_sql())
    missing = [k for k in _window_keys() if k.startswith("q_") and k not in os_]
    assert not missing, missing


def test_registry_callables_resolve():
    qs = E.queries()
    assert len(qs) >= 100
    assert all(callable(v) for v in qs.values())
