"""Property test for the SPARQL string-token canonicalization
(operators/sparql.py::_canonical_string): for arbitrary text, every
legal source encoding — short '/" forms with escaped quotes, long
triple-quoted forms with bare quotes — must tokenize to ONE canonical
short double-quoted token whose ``_unescape(text[1:-1])`` round-trips
the original value.  Pure parser level, no SparkSession."""

from hypothesis import given, settings
from hypothesis import strategies as st

from face_hunter_spark.operators.sparql import _tokenize, _unescape

# characters whose escape handling the tokenizer owns; excludes the
# quote chars themselves (added per-form below) and NUL, which
# _unescape uses as its internal sentinel (a NUL byte cannot appear
# in real SPARQL source text)
_BODY = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters='"\'\\\x00'
    ),
    max_size=40,
)


def _tok_value(src: str) -> str:
    toks = _tokenize(src)
    assert len(toks) == 1 and toks[0].kind == "STRING", src
    t = toks[0].text
    assert t[0] == '"' and t[-1] == '"' and not t.startswith('"""')
    return _unescape(t[1:-1])


@settings(max_examples=200, deadline=None)
@given(_BODY, st.sampled_from(["'", '"', "'''", '"""']))
def test_plain_text_round_trips_in_every_form(body, q):
    assert _tok_value(f"{q}{body}{q}") == body


@settings(max_examples=200, deadline=None)
@given(_BODY, _BODY)
def test_embedded_quotes(left, right):
    # bare " inside '-quoted; bare ' inside "-quoted; both escaped
    assert _tok_value(f"'{left}\"{right}'") == f'{left}"{right}'
    assert _tok_value(f'"{left}\'{right}"') == f"{left}'{right}"
    assert _tok_value(f"'{left}\\'{right}'") == f"{left}'{right}"
    assert _tok_value(f'"{left}\\"{right}"') == f'{left}"{right}'


@settings(max_examples=200, deadline=None)
@given(_BODY, _BODY)
def test_long_forms_take_bare_quotes_and_newlines(left, right):
    val = f"{left}\n'x\" {right}"
    assert _tok_value(f'"""{val}"""') == val
    val2 = f'{left}"y\n{right}'
    assert _tok_value(f"'''{val2}'''") == val2


@settings(max_examples=200, deadline=None)
@given(_BODY)
def test_backslash_escapes_survive(body):
    # \n, \t, \\ written as source escapes resolve to control chars
    src = f'"{body}\\n\\t\\\\"'
    assert _tok_value(src) == f"{body}\n\t\\"
    src2 = f"'{body}\\n\\t\\\\'"
    assert _tok_value(src2) == f"{body}\n\t\\"
