"""Token metadata + navigation tooling parity
(reference src/token-metadata.ts, src/utils.ts:100-273)."""

from mentor_rdf_parsers_spark.functions import (
    get_blank_node_id_from_token,
    get_first_token_of_type,
    get_last_token_of_type,
    get_next_token,
    get_prefix_from_token,
    get_previous_token,
    get_token_at_offset,
    get_token_metadata,
    get_token_position,
    has_token_flag,
    is_upper_case_token,
    is_variable_token,
    split_prefixed_name,
)
from mentor_rdf_parsers_spark.parsing.lexer import Lexer, Token
from mentor_rdf_parsers_spark.parsing.tokens import TURTLE_TOKENS


def _lex(text):
    tokens, errors = Lexer(TURTLE_TOKENS).tokenize(text)
    assert not errors
    return tokens


# --- metadata (src/token-metadata.ts) -------------------------------------

def test_keyword_flags():
    md = get_token_metadata("SELECT")
    assert md.is_keyword and md.is_major_clause and not md.is_function
    assert get_token_metadata("FILTER").is_function
    assert get_token_metadata("WHERE").is_newline_keyword


def test_lowercase_only_keywords():
    # true, false, a must never be case-transformed (ts:50-56)
    for name in ("TRUE", "FALSE", "A"):
        md = get_token_metadata(name)
        assert md.is_lowercase_only and md.is_keyword and md.is_term


def test_term_iri_literal_flags():
    assert get_token_metadata("IRIREF").is_iri
    assert get_token_metadata("IRIREF").is_term
    assert get_token_metadata("PNAME_LN").is_iri
    md = get_token_metadata("STRING_LITERAL_QUOTE")
    assert md.is_literal and md.is_term and not md.is_iri
    assert get_token_metadata("INTEGER").is_literal
    assert get_token_metadata("BLANK_NODE_LABEL").is_term


def test_bracket_pairing_flags():
    assert get_token_metadata("LBRACKET").is_opening_bracket
    assert get_token_metadata("LBRACKET").is_blank_node_scope
    assert get_token_metadata("RBRACKET").is_closing_bracket
    assert get_token_metadata("OPEN_TRIPLE_TERM").is_opening_bracket
    # <<( does NOT open a bnode scope, << does (ts:248-249)
    assert not get_token_metadata("OPEN_TRIPLE_TERM").is_blank_node_scope
    assert get_token_metadata("OPEN_REIFIED_TRIPLE").is_blank_node_scope


def test_punctuation_spacing_flags():
    for name in ("PERIOD", "SEMICOLON", "COMMA"):
        md = get_token_metadata(name)
        assert md.is_punctuation and md.no_space_before
    assert get_token_metadata("DCARET").is_punctuation
    assert not get_token_metadata("DCARET").no_space_before


def test_whitespace_comment_and_unknown():
    assert get_token_metadata("WS").is_whitespace
    assert get_token_metadata("COMMENT").is_comment
    assert get_token_metadata("NOT_A_TOKEN") is None
    assert has_token_flag("SELECT", "is_major_clause")
    assert not has_token_flag("NOT_A_TOKEN", "is_keyword")


# --- navigation (src/utils.ts:100-273) ------------------------------------

def test_split_prefixed_name():
    assert split_prefixed_name("ex:foo") == ("ex", "foo")
    assert split_prefixed_name(":foo") == ("", "foo")
    assert split_prefixed_name("noprefix") == ("", "")
    assert split_prefixed_name("noprefix", True) == ("noprefix", "")


def test_next_previous_token():
    tokens = _lex("<http://a/s> <http://a/p> <http://a/o> .")
    assert get_next_token(tokens, tokens[0]) is tokens[1]
    assert get_previous_token(tokens, tokens[1]) is tokens[0]
    assert get_next_token(tokens, tokens[-1]) is None
    assert get_previous_token(tokens, tokens[0]) is None
    # a token not from this stream (ts indexOf -1 semantics)
    stray = Token("IRIREF", "<x>", 0)
    assert get_next_token(tokens, stray) is None


def test_first_last_of_type():
    tokens = _lex('ex:s ex:p "v" ; ex:q "w" .')
    first = get_first_token_of_type(tokens, "PNAME_LN")
    assert first is tokens[0]
    last = get_last_token_of_type(tokens, ["STRING_LITERAL_QUOTE"])
    assert last.image == '"w"'
    assert get_first_token_of_type(tokens, "LANGTAG") is None
    assert get_last_token_of_type(tokens, ["LANGTAG"]) is None


def test_token_at_offset_inclusive_end():
    tokens = _lex("<http://a/s> <http://a/p> <http://a/o> .")
    t0 = tokens[0]
    hit = get_token_at_offset(tokens, t0.start + 1)
    assert t0 in hit
    # cursor just past the token still hits it (<= endOffset, ts:191-193)
    assert t0 in get_token_at_offset(tokens, t0.start + len(t0.image))
    assert get_token_at_offset(tokens, 10_000) == []


def test_token_position_lines_and_columns():
    text = "ex:s\n  ex:p ex:o ."
    tokens = _lex(text)
    pred = [t for t in tokens if t.image == "ex:p"][0]
    pos = get_token_position(pred, text)
    assert pos["start_line"] == 2
    assert pos["start_column"] == 3
    assert pos["end_offset"] == pred.start + 3
    # offsets-only form works without the text
    bare = get_token_position(pred)
    assert bare["start_offset"] == pred.start


def test_variable_case_prefix_helpers():
    assert is_variable_token(Token("VAR", "?x", 0))
    assert is_variable_token(Token("QUICK_VAR", "?x", 0))
    assert not is_variable_token(Token("IRIREF", "<x>", 0))
    assert is_upper_case_token(Token("KW", "SELECT", 0))
    assert not is_upper_case_token(Token("KW", "select", 0))
    assert not is_upper_case_token(None)
    assert get_prefix_from_token(Token("PNAME_LN", "ex:foo", 0)) == "ex"
    assert get_prefix_from_token(Token("PNAME_NS", "ex:", 0)) == "ex"
    try:
        get_prefix_from_token(Token("IRIREF", "<x>", 0))
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_blank_node_id_from_token():
    tokens = _lex("_:b1 <http://a/p> _:b2 .")
    labeled = [t for t in tokens if t.type == "BLANK_NODE_LABEL"]
    assert len(labeled) == 2
    assert all(get_blank_node_id_from_token(t) for t in labeled)
