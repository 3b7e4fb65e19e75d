"""Synthetic reference-domain fixtures per FIXTURES.md §A.

Deterministic (seeded) generators for:
- ``orders_rows`` — raw orders matching the ``Product`` schema, including the
  hostile cases (hour==24, negative hours, fractional dspo, non-ASCII and
  whitespace-padded product names, orphan products);
- CSV files ``00.csv..04.csv`` (headerless, quoted) incl. malformed rows for
  DROPMALFORMED, for watermark tests;
- ``product_details_rows`` — dimension covering every category-rule
  department plus neutrals;
- engineered users pinning the integer-division category rules
  (FIXTURES.md §A3).
"""

from __future__ import annotations

import csv
import io
import random
from pathlib import Path

MOM = ["dairy eggs", "bakery", "household", "babies"]
SINGLE = ["canned goods", "meat seafood", "alcohol", "snacks", "beverages"]
PET = ["canned goods", "pets", "frozen"]
NEUTRAL = ["produce", "pantry", "personal care"]
ALL_DEPARTMENTS = sorted(set(MOM + SINGLE + PET + NEUTRAL))

# product name -> (aisle, department); one product per department + specials
PRODUCTS = {f"prod_{dep.replace(' ', '_')}": (f"aisle_{i % 5}", dep) for i, dep in enumerate(ALL_DEPARTMENTS)}
PRODUCTS["padded product"] = ("aisle_9", "produce")  # post-trim join target
ORPHAN_PRODUCT = "prod_orphan"  # absent from the dimension -> NULL department


def detail(items: list[tuple[str, str, int]]) -> str:
    return "~".join(f"{p}|{a}|{q}" for p, a, q in items)


def product_details_rows() -> list[tuple[str, str, str]]:
    return [(name, aisle, dep) for name, (aisle, dep) in sorted(PRODUCTS.items())]


def _items_for(departments: list[str], qty: int = 2) -> list[tuple[str, str, int]]:
    out = []
    for dep in departments:
        name = f"prod_{dep.replace(' ', '_')}"
        out.append((name, PRODUCTS[name][0], qty))
    return out


def orders_rows() -> list[tuple]:
    """Engineered users (user_id meanings):

    - 1: 100 % mom departments → Mom
    - 2: 100 % single departments → Single
    - 3: 100 % pet departments → Pet Friendly
    - 4: 99 %-mom mix → "A complete mystery" (integer-division discriminator)
    - 5: canned-goods-only basket → Single (priority over Pet Friendly,
         since canned goods ∈ both lists)
    - 6: neutral departments only → mystery
    - 7: orphan product + unicode/whitespace dirt → NULL department path
    - 8: hour 24 and negative hour/dspo rows (cleaning rules)
    Every user's rows share one (order_dow, dspo) so segmentation is
    deterministic on this fixture (FIXTURES.md §A3).
    """
    rows: list[tuple] = []
    oid = 100

    def add(user_id, order_number, dow, hour, dspo, items):
        nonlocal oid
        rows.append((oid, user_id, order_number, dow, hour, dspo, detail(items)))
        oid += 1

    add(1, 1, 0, 9, 3.0, _items_for(MOM, qty=5))
    add(1, 2, 0, 10, 3.0, _items_for(["bakery"], qty=7))
    add(2, 1, 1, 9, 12.0, _items_for(SINGLE, qty=4))
    add(3, 1, 2, 9, 25.0, _items_for(PET, qty=6))
    # user 4: large mom share but one neutral item -> integer ratio 0
    add(4, 1, 3, 9, 3.0, _items_for(MOM, qty=33) + _items_for(["produce"], qty=1))
    add(5, 1, 4, 9, 12.0, _items_for(["canned goods"], qty=9))
    add(6, 1, 5, 9, 25.0, _items_for(NEUTRAL, qty=2))
    add(
        7,
        1,
        6,
        9,
        3.0,
        [
            (ORPHAN_PRODUCT, "aisle_x", 1),
            ("prod_prodüce", "aisle_y", 1),  # non-ASCII -> stripped -> still orphan
            ("  padded product  ", "aisle_9", 2),
        ],
    )
    add(8, 1, 0, 24, 4.6, _items_for(["produce"], qty=3))
    add(8, 2, 0, -14, 4.2, _items_for(["pantry"], qty=2))
    return rows


def orders_csv_text(rows: list[tuple], malformed: int = 0) -> str:
    buf = io.StringIO()
    writer = csv.writer(buf, quoting=csv.QUOTE_MINIMAL, doublequote=True, lineterminator="\n")
    for row in rows:
        writer.writerow(row)
    for i in range(malformed):
        buf.write("not,enough\n")
    return buf.getvalue()


def write_csv_files(path: Path, n_files: int = 5, malformed_in_last: int = 2) -> list[tuple]:
    """Split the fixture rows round-robin into 00.csv..0N.csv; the last file
    gets malformed rows for the DROPMALFORMED assertion. Returns all rows."""
    rows = orders_rows()
    path.mkdir(parents=True, exist_ok=True)
    chunks: list[list[tuple]] = [[] for _ in range(n_files)]
    for i, row in enumerate(rows):
        chunks[i % n_files].append(row)
    for i, chunk in enumerate(chunks):
        malformed = malformed_in_last if i == n_files - 1 else 0
        (path / f"{i:02d}.csv").write_text(orders_csv_text(chunk, malformed))
    return rows


def random_order_detail(rng: random.Random, n_items: int) -> tuple[str, int]:
    """Random well-formed encoding; returns (encoded, item_count) for the
    property test `rows == count('~') + 1`."""
    names = list(PRODUCTS)
    items = [
        (rng.choice(names), f"aisle_{rng.randrange(10)}", rng.randrange(1, 9))
        for _ in range(n_items)
    ]
    return detail(items), n_items
