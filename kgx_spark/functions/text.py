"""Case-conversion + Biolink-format column expressions.

Reference: kgx/utils/kgx_utils.py
- camelcase→sentencecase: 116-133; snakecase→sentencecase: 136-151
- sentencecase→snakecase: 154-168; sentencecase→camelcase: 171-187
- format_biolink_category: 190-207; format_biolink_slots: 210-220

The reference delegates to two tiny public kernels:

- ``stringcase.sentencecase(s).lower()`` — first run ``stringcase.camelcase``
  (strip ONE leading ``[-_.]``, lowercase char 0, then each
  ``[-_.\\s]([a-z])`` pair in ``s[1:]`` becomes the letter uppercased), then
  insert ``" "`` before every remaining capital, strip, lowercase. Net
  effect on spacing, reproduced exactly below: in the tail (everything after
  char 0 of the stripped string), each separator+lowercase pair collapses to
  ``" letter"`` and every capital gains a leading space; the head char never
  gains a space. Acronyms therefore space out: ``RNAProduct`` →
  ``r n a product`` (this module's pre-round-6 version collapsed them —
  the divergence documented in COVERAGE.md §2.4 is fixed here).
- ``inflection.camelize(stringcase.snakecase(s))`` — snakecase maps
  ``[-.\\s]`` → ``_`` and prefixes every capital after char 0 with ``_``;
  camelize then uppercases each segment-initial character and drops the
  separating underscores, PRESERVING other interior case (``FooBar`` →
  ``foo_bar`` → ``FooBar``, not ``Foobar``).

Known residual divergence (documented, not chased): ``inflection.camelize``
consumes ``(?:^|_)(.)`` pairs left-to-right, so a RUN of separators (or a
leading/trailing separator in the snakecased intermediate) behaves
pathologically in the reference — ``named  thing`` → ``Named_thing``,
``" foo"`` → ``_foo``. The split-capitalize-join below instead yields
``NamedThing`` / ``Foo``. Sentence-case inputs never contain separator
runs, and tests/test_functions.py pins the divergence explicitly.

All pure regexp/concat/array expressions — codegen'd, no Python on
executors. Differential-tested against verbatim ports of the public
kernels in tests/test_functions.py (test_case_differential).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _head(col: Column) -> Column:
    return col.substr(F.lit(1), F.lit(1))


def _tail(col: Column) -> Column:
    return col.substr(F.lit(2), F.length(col))


def _snakecase_keepcase(col: Column) -> Column:
    """stringcase.snakecase WITHOUT the per-char lowering: ``[-.\\s]`` → ``_``
    globally, then ``_`` inserted before every capital after char 0. Callers
    either lowercase the whole result (snake_case) or re-capitalize
    segment-initial chars (camel_case), so the deferred lowering is
    unobservable."""
    u = F.regexp_replace(col, r"[-.\s]", "_")
    return F.concat(_head(u), F.regexp_replace(_tail(u), r"([A-Z])", r"_$1"))


def sentence_case(col: Column) -> Column:
    """camelCase or snake_case → sentence case (kgx_utils.py:116-151,
    ``stringcase.sentencecase(s).lower()``).

    ``NamedThing`` → ``named thing``; ``RNAProduct`` → ``r n a product``;
    ``related_to`` → ``related to``; ``foo_2bar`` → ``foo_2bar`` (the kernel
    only collapses separators before LOWERCASE letters).
    """
    t = F.regexp_replace(col, r"^[-_.]", "")  # anchored: strips one char max
    tail = F.regexp_replace(_tail(t), r"[-_.\s]([a-z])", r" $1")
    tail = F.regexp_replace(tail, r"([A-Z])", r" $1")
    joined = F.concat(_head(t), tail)
    return F.lower(F.regexp_replace(joined, r"^\s+|\s+$", ""))


def snake_case(col: Column) -> Column:
    """sentence case → snake_case (kgx_utils.py:154-168,
    ``stringcase.snakecase(s).lower()``).

    ``named thing`` → ``named_thing``; ``FooBar`` → ``foo_bar`` (capitals
    after char 0 gain a ``_``); hyphens/dots/whitespace each map to one
    ``_`` (runs preserved, no trimming — faithful to the kernel).
    """
    return F.lower(_snakecase_keepcase(col))


def camel_case(col: Column) -> Column:
    """sentence case → CamelCase (kgx_utils.py:171-187,
    ``inflection.camelize(stringcase.snakecase(s))``).

    Split the snakecased intermediate on ``_``, uppercase each segment's
    first character (leaving the rest untouched, so interior capitals
    survive: ``FooBar`` → ``FooBar``, ``foo BAR`` → ``FooBAR``), join.
    See module docstring for the separator-run residual.
    """
    segments = F.split(_snakecase_keepcase(col), "_", -1)
    capped = F.transform(
        segments,
        lambda x: F.concat(F.upper(x.substr(F.lit(1), F.lit(1))),
                           x.substr(F.lit(2), F.length(x))),
    )
    return F.array_join(capped, "")


def format_biolink_category(col: Column) -> Column:
    """'named thing' → 'biolink:NamedThing' (kgx_utils.py:190-207).

    Pass-through only for values already matching ``^biolink:.+`` — the
    reference's ``re.match("biolink:.+", s)`` — so a non-biolink CURIE like
    ``GO:123`` is (re)formatted, exactly as the reference does.
    """
    return F.when(col.rlike("^biolink:."), col).otherwise(
        F.concat(F.lit("biolink:"), camel_case(col))
    )


def format_biolink_slot(col: Column) -> Column:
    """'related to' → 'biolink:related_to' (kgx_utils.py:210-220)."""
    return F.when(col.rlike("^biolink:."), col).otherwise(
        F.concat(F.lit("biolink:"), snake_case(col))
    )
