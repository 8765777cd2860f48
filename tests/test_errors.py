"""Error-message regression (the reference locks error texts in
test/regress/input/error.yaml — same spirit: user mistakes must fail
at bind time with a message naming the offending part, never as an
opaque Spark analysis error)."""

import pytest

from htsql_spark import CompileError
from htsql_spark.syntax.parse import ParseError


@pytest.mark.parametrize(
    "query,exc,needle",
    [
        ("/customer{name", ParseError, "expected '}'"),
        ("/customer{c_name}?bogus_col > 1", CompileError, "unknown attribute 'bogus_col'"),
        ("/nosuchtable", CompileError, "nosuchtable"),
        ("/nation{count(region.name)}", CompileError, "plural flow"),
        ("/customer{orders}", CompileError, "plural expression 'orders' in singular context"),
        ("/region[1.2]", CompileError, "does not match region identity"),
        ("/customer{name := }", ParseError, ""),
        ("/customer.limit(c_acctbal)", CompileError, "integer literal"),
        ("/customer{count()}", CompileError, "needs a plural argument"),
        ("/region{name}?$nope > 1", CompileError, "unknown reference"),
        ("/customer{nation}", CompileError, "is a link, select a column"),
    ],
)
def test_error_messages(db, query, exc, needle):
    with pytest.raises(exc) as ei:
        db.df(query)
    assert needle in str(ei.value)


def test_plural_in_singular_names_the_fix(db):
    """The error for a plural-in-singular mistake must point at the
    aggregate/segment remedies (reference does the same)."""
    with pytest.raises(CompileError) as ei:
        db.df("/nation{name, customer.c_name}")
    msg = str(ei.value)
    assert "aggregate" in msg or "segment" in msg


from hypothesis import HealthCheck, given, settings, strategies as st


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(st.text(min_size=1, max_size=40))
def test_arbitrary_input_fails_cleanly(db, junk):
    """Any input either compiles or raises a USER error (ParseError /
    CompileError) — never an internal exception or a Spark
    AnalysisException leaking through."""
    try:
        db.df("/" + junk)
    except (ParseError, CompileError):
        pass
