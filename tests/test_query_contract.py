"""Pins the registration-order invariant the driver's correctness gate
depends on (r3 verdict "What's wrong #2"): the driver verifies only the
FIRST 50 entries of ``queries()``, so every exact-oracled query must sit
inside that window and the tail past the window may hold only rows-only
registrations (whose semantics are pinned by dedicated pytest suites)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

DRIVER_WINDOW = 50


def test_every_oracled_query_is_inside_the_driver_window():
    names = list(entrymod.queries())  # dicts preserve registration order
    oracled = set(entrymod.oracle_sql())
    outside = [n for n in names[DRIVER_WINDOW:] if n in oracled]
    assert not outside, (
        f"oracled queries registered past the driver's {DRIVER_WINDOW}-entry "
        f"window would silently lose verification: {outside}"
    )


def test_oracle_keys_are_registered_queries():
    names = set(entrymod.queries())
    stray = set(entrymod.oracle_sql()) - names
    assert not stray, f"oracle_sql entries without a queries() entry: {stray}"
