"""SPARQL 1.2 tokenizer + recursive-descent parser → AST.

Re-creates the parse surface of the reference's Chevrotain grammar
(/root/reference/src/sparql/parser.ts, productions [1]-[158] of SPARQL
1.2 Query + Update) as a hand-rolled recursive-descent parser. The CST
the reference builds is an implementation detail; we produce a compact
AST the executor consumes directly.

Reference behaviors replicated:
* codepoint escape pre-pass over the whole query text, rejecting
  surrogate code points (src/sparql/parser.ts:249-261, applied :283);
* `_verbIsSimplePath` context: annotations/reifiers only after simple
  (non-path) verbs (src/sparql/parser.ts:447, spec note 16);
* `_insideDeleteBlock`: no blank nodes / reifiers / annotations inside
  DELETE templates (src/sparql/parser.ts:455, spec note 7);
* signed numeric literals lex as one token and act as additive operators
  (`?x+1` → VAR INTEGER_POSITIVE), as in the Chevrotain vocabulary
  (src/sparql/parser.ts:24-235).

Terms: ('iri', v) | ('var', name) | ('bnode', label) |
('literal', value, lang, dt) | ('tripleterm', (s,p,o)) | ('a',) is
normalized to rdf:type. Property paths are dicts {'path': op, ...}.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from ..parsing import tokens as T
from ..parsing.terms import RDF, unescape_rdf_string

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = ("iri", RDF + "type")


class SparqlParseError(Exception):
    def __init__(self, message: str, offset: int = 0):
        super().__init__(f"{message} (at offset {offset})")
        self.offset = offset


# ---------------------------------------------------------------------------
# codepoint escape pre-pass (src/sparql/parser.ts:249-261)
# ---------------------------------------------------------------------------

_CODEPOINT_RE = re.compile(r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})")


def resolve_codepoint_escapes(text: str) -> str:
    def sub(m: re.Match) -> str:
        cp = int(m.group(1) or m.group(2), 16)
        if 0xD800 <= cp <= 0xDFFF:
            raise SparqlParseError(
                f"surrogate code point U+{cp:04X} is not allowed", m.start()
            )
        if cp > 0x10FFFF:
            raise SparqlParseError(f"code point out of range: {cp:X}", m.start())
        return chr(cp)

    return _CODEPOINT_RE.sub(sub, text)


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

KEYWORDS = {
    "BASE", "PREFIX", "VERSION", "SELECT", "DISTINCT", "REDUCED", "AS",
    "CONSTRUCT", "WHERE", "DESCRIBE", "ASK", "FROM", "NAMED", "GROUP", "BY",
    "HAVING", "ORDER", "ASC", "DESC", "LIMIT", "OFFSET", "VALUES", "UNDEF",
    "OPTIONAL", "GRAPH", "SERVICE", "SILENT", "BIND", "UNION", "MINUS",
    "FILTER", "EXISTS", "NOT", "IN", "SEPARATOR",
    # update
    "LOAD", "INTO", "CLEAR", "DROP", "CREATE", "ADD", "MOVE", "COPY", "TO",
    "INSERT", "DELETE", "DATA", "WITH", "USING", "DEFAULT", "ALL",
    # builtins that collide with function-name parsing are handled as calls
}

BUILTIN_CALLS = {
    "STR", "LANG", "LANGMATCHES", "LANGDIR", "DATATYPE", "BOUND", "IRI",
    "URI", "BNODE", "RAND", "ABS", "CEIL", "FLOOR", "ROUND", "CONCAT",
    "STRLEN", "UCASE", "LCASE", "ENCODE_FOR_URI", "CONTAINS", "STRSTARTS",
    "STRENDS", "STRBEFORE", "STRAFTER", "YEAR", "MONTH", "DAY", "HOURS",
    "MINUTES", "SECONDS", "TIMEZONE", "TZ", "NOW", "UUID", "STRUUID", "MD5",
    "SHA1", "SHA256", "SHA384", "SHA512", "COALESCE", "IF", "STRLANG",
    "STRLANGDIR", "STRDT", "SAMETERM", "ISIRI", "ISURI", "ISBLANK",
    "ISLITERAL", "ISNUMERIC", "REGEX", "SUBSTR", "REPLACE", "ISTRIPLE",
    "TRIPLE", "SUBJECT", "PREDICATE", "OBJECT", "HASLANG", "HASLANGDIR",
}

AGGREGATES = {"COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE", "GROUP_CONCAT"}

_TOKEN_SPECS: List[Tuple[str, re.Pattern]] = [
    ("STRING_LONG2", re.compile(T.STRING_LITERAL_LONG_QUOTE)),
    ("STRING_LONG1", re.compile(T.STRING_LITERAL_LONG_SINGLE_QUOTE)),
    ("STRING2", re.compile(T.STRING_LITERAL_QUOTE)),
    ("STRING1", re.compile(T.STRING_LITERAL_SINGLE_QUOTE)),
    ("TT_OPEN", re.compile(r"<<\(")),
    ("TT_CLOSE", re.compile(r"\)>>")),
    ("RT_OPEN", re.compile(r"<<")),
    ("RT_CLOSE", re.compile(r">>")),
    ("LE", re.compile(r"<=")),
    ("GE", re.compile(r">=")),
    ("IRIREF", re.compile(T.IRIREF)),
    ("ANN_OPEN", re.compile(r"\{\|")),
    ("ANN_CLOSE", re.compile(r"\|\}")),
    ("OROR", re.compile(r"\|\|")),
    ("ANDAND", re.compile(r"&&")),
    ("NE", re.compile(r"!=")),
    ("HATHAT", re.compile(r"\^\^")),
    ("DOUBLE", re.compile(T.DOUBLE)),
    ("DECIMAL", re.compile(T.DECIMAL)),
    ("INTEGER", re.compile(T.INTEGER)),
    ("LANGTAG", re.compile(T.LANGTAG)),
    ("PNAME_LN", re.compile(T.PNAME_LN)),
    ("PNAME_NS", re.compile(T.PNAME_NS)),
    ("BLANK_NODE_LABEL", re.compile(T.BLANK_NODE_LABEL)),
    ("VAR", re.compile(rf"[?$]({T.PN_CHARS_U}|\d)({T.PN_CHARS_U}|\d|·|[̀-ͯ]|[‿-⁀])*")),
    ("ANON", re.compile(T.ANON)),
    ("NIL", re.compile(r"\(\s*\)")),
    ("WORD", re.compile(r"[A-Za-z_][A-Za-z0-9_]*")),
]

_PUNCT = "{}()[].,;|/^?*+!=<>~@-"


class Tok:
    __slots__ = ("type", "value", "pos")

    def __init__(self, type_: str, value: str, pos: int):
        self.type = type_
        self.value = value
        self.pos = pos

    def __repr__(self) -> str:  # pragma: no cover
        return f"Tok({self.type},{self.value!r}@{self.pos})"


_WS_RE = re.compile(r"(?:[\s﻿]+|#[^\n\r]*)+")


def tokenize(text: str) -> List[Tok]:
    out: List[Tok] = []
    i, n = 0, len(text)
    while i < n:
        m = _WS_RE.match(text, i)
        if m:
            i = m.end()
            if i >= n:
                break
        matched = False
        for name, rx in _TOKEN_SPECS:
            m = rx.match(text, i)
            if m and m.end() > i:
                val = m.group(0)
                if name == "WORD":
                    up = val.upper()
                    if val == "a":
                        out.append(Tok("A_KW", val, i))
                    elif val in ("true", "false"):
                        out.append(Tok("BOOLEAN", val, i))
                    elif up in KEYWORDS or up in BUILTIN_CALLS or up in AGGREGATES:
                        out.append(Tok("KW", up, i))
                    else:
                        raise SparqlParseError(f"unexpected identifier {val!r}", i)
                else:
                    out.append(Tok(name, val, i))
                i = m.end()
                matched = True
                break
        if matched:
            continue
        c = text[i]
        if c in _PUNCT:
            out.append(Tok(c, c, i))
            i += 1
            continue
        raise SparqlParseError(f"unexpected character {c!r}", i)
    out.append(Tok("EOF", "", n))
    return out


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


class Parser:
    def __init__(
        self,
        tokens: List[Tok],
        strict_spec_notes: bool = True,
        collect_prefix_errors: bool = False,
    ):
        self.toks = tokens
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base: Optional[str] = None
        self._bnode_n = 0
        self._verb_is_simple_path = True
        self._inside_delete = False
        self.strict_spec_notes = strict_spec_notes
        self.collect_prefix_errors = collect_prefix_errors
        self.semantic_errors: List[dict] = []

    # --- token utilities ---
    @property
    def cur(self) -> Tok:
        return self.toks[self.i]

    def at(self, *types: str) -> bool:
        return self.cur.type in types

    def at_kw(self, *kws: str) -> bool:
        return self.cur.type == "KW" and self.cur.value in kws

    def take(self, type_: str) -> Tok:
        if self.cur.type != type_:
            raise SparqlParseError(
                f"expected {type_}, found {self.cur.type} {self.cur.value!r}",
                self.cur.pos,
            )
        t = self.cur
        self.i += 1
        return t

    def take_kw(self, *kws: str) -> str:
        if not self.at_kw(*kws):
            raise SparqlParseError(
                f"expected {'/'.join(kws)}, found {self.cur.value!r}", self.cur.pos
            )
        v = self.cur.value
        self.i += 1
        return v

    def opt_kw(self, *kws: str) -> Optional[str]:
        if self.at_kw(*kws):
            return self.take_kw(*kws)
        return None

    def opt(self, type_: str) -> Optional[Tok]:
        if self.at(type_):
            return self.take(type_)
        return None

    def fresh_bnode(self) -> tuple:
        self._bnode_n += 1
        return ("bnode", f"_anon{self._bnode_n}")

    # --- entry points ---
    def parse_unit(self) -> dict:
        self.parse_prologue()
        if self.at_kw("SELECT", "CONSTRUCT", "DESCRIBE", "ASK"):
            q = self.parse_query_body()
            q["prefixes"] = dict(self.prefixes)
            q["base"] = self.base
            self.take("EOF")
            return q
        # update sequence
        ops = []
        while not self.at("EOF"):
            ops.append(self.parse_update1())
            if self.opt(";"):
                self.parse_prologue()
                continue
            break
        self.take("EOF")
        return {"type": "update", "operations": ops,
                "prefixes": dict(self.prefixes), "base": self.base}

    def parse_prologue(self) -> None:
        while True:
            if self.at_kw("BASE"):
                self.take_kw("BASE")
                self.base = self.iriref_value(self.take("IRIREF"))
            elif self.at_kw("PREFIX"):
                self.take_kw("PREFIX")
                ns = self.take("PNAME_NS").value[:-1]
                self.prefixes[ns] = self.iriref_value(self.take("IRIREF"))
            elif self.at_kw("VERSION"):
                self.take_kw("VERSION")
                if not self.at("STRING1", "STRING2"):
                    raise SparqlParseError(
                        "VERSION requires a short-quoted string", self.cur.pos
                    )
                self.take_string()
            else:
                return

    # --- query forms ---
    def parse_query_body(self) -> dict:
        if self.at_kw("SELECT"):
            q = self.parse_select(sub=False)
        elif self.at_kw("CONSTRUCT"):
            q = self.parse_construct()
        elif self.at_kw("DESCRIBE"):
            q = self.parse_describe()
        else:
            q = self.parse_ask()
        # trailing ValuesClause
        if self.at_kw("VALUES"):
            q["values"] = self.parse_inline_data()
        return q

    def parse_select(self, sub: bool) -> dict:
        self.take_kw("SELECT")
        distinct = reduced = False
        if self.opt_kw("DISTINCT"):
            distinct = True
        elif self.opt_kw("REDUCED"):
            reduced = True
        projection: object
        if self.opt("*"):
            projection = "*"
        else:
            projection = []
            while True:
                if self.at("VAR"):
                    projection.append(("var", self.take("VAR").value[1:]))
                elif self.at("("):
                    self.take("(")
                    e = self.parse_expression()
                    self.take_kw("AS")
                    v = self.take("VAR").value[1:]
                    self.take(")")
                    projection.append(("expr", e, v))
                else:
                    break
            if not projection:
                raise SparqlParseError("empty SELECT clause", self.cur.pos)
        dataset = [] if sub else self.parse_dataset_clauses()
        self.opt_kw("WHERE")
        where = self.parse_group_graph_pattern()
        mods = self.parse_solution_modifiers()
        return {
            "type": "query", "form": "select", "distinct": distinct,
            "reduced": reduced, "projection": projection, "dataset": dataset,
            "where": where, "modifiers": mods,
        }

    def parse_construct(self) -> dict:
        self.take_kw("CONSTRUCT")
        if self.at("{"):
            template = self.parse_construct_template()
            dataset = self.parse_dataset_clauses()
            self.take_kw("WHERE")
            where = self.parse_group_graph_pattern()
            mods = self.parse_solution_modifiers()
        else:
            # CONSTRUCT WHERE { triples } shorthand
            dataset = self.parse_dataset_clauses()
            self.take_kw("WHERE")
            self.take("{")
            template = self.parse_triples_block() if not self.at("}") else []
            self.take("}")
            where = {"type": "bgp", "triples": template}
            mods = self.parse_solution_modifiers()
        return {
            "type": "query", "form": "construct", "template": template,
            "dataset": dataset, "where": where, "modifiers": mods,
        }

    def parse_describe(self) -> dict:
        self.take_kw("DESCRIBE")
        targets: object
        if self.opt("*"):
            targets = "*"
        else:
            targets = []
            while self.at("VAR") or self.at("IRIREF", "PNAME_LN", "PNAME_NS"):
                if self.at("VAR"):
                    targets.append(("var", self.take("VAR").value[1:]))
                else:
                    targets.append(self.parse_iri())
            if not targets:
                raise SparqlParseError("DESCRIBE needs targets or *", self.cur.pos)
        dataset = self.parse_dataset_clauses()
        where = None
        if self.opt_kw("WHERE") or self.at("{"):
            where = self.parse_group_graph_pattern()
        mods = self.parse_solution_modifiers()
        return {"type": "query", "form": "describe", "targets": targets,
                "dataset": dataset, "where": where, "modifiers": mods}

    def parse_ask(self) -> dict:
        self.take_kw("ASK")
        dataset = self.parse_dataset_clauses()
        self.opt_kw("WHERE")
        where = self.parse_group_graph_pattern()
        mods = self.parse_solution_modifiers()
        return {"type": "query", "form": "ask", "dataset": dataset,
                "where": where, "modifiers": mods}

    def parse_dataset_clauses(self) -> list:
        out = []
        while self.at_kw("FROM"):
            self.take_kw("FROM")
            named = bool(self.opt_kw("NAMED"))
            out.append({"named": named, "iri": self.parse_iri()})
        return out

    # --- solution modifiers ---
    def parse_solution_modifiers(self) -> dict:
        mods: dict = {}
        if self.at_kw("GROUP"):
            self.take_kw("GROUP")
            self.take_kw("BY")
            conds = []
            while True:
                if self.at("("):
                    self.take("(")
                    e = self.parse_expression()
                    alias = None
                    if self.opt_kw("AS"):
                        alias = self.take("VAR").value[1:]
                    self.take(")")
                    conds.append(("expr", e, alias))
                elif self.at("VAR"):
                    conds.append(("var", self.take("VAR").value[1:]))
                elif self.at("IRIREF", "PNAME_LN", "PNAME_NS") or (
                    self.cur.type == "KW" and self.cur.value in BUILTIN_CALLS
                ):
                    conds.append(("expr", self.parse_primary_expression(), None))
                else:
                    break
            if not conds:
                raise SparqlParseError("empty GROUP BY", self.cur.pos)
            mods["group_by"] = conds
        if self.at_kw("HAVING"):
            self.take_kw("HAVING")
            having = [self.parse_constraint()]
            while self.at("(") or (self.cur.type == "KW" and self.cur.value in BUILTIN_CALLS | AGGREGATES):
                having.append(self.parse_constraint())
            mods["having"] = having
        if self.at_kw("ORDER"):
            self.take_kw("ORDER")
            self.take_kw("BY")
            conds = []
            while True:
                if self.at_kw("ASC", "DESC"):
                    d = self.take_kw("ASC", "DESC")
                    self.take("(")
                    e = self.parse_expression()
                    self.take(")")
                    conds.append((d.lower(), e))
                elif self.at("VAR"):
                    conds.append(("asc", ("var", self.take("VAR").value[1:])))
                elif self.at("(") or (self.cur.type == "KW" and self.cur.value in BUILTIN_CALLS | AGGREGATES):
                    conds.append(("asc", self.parse_constraint()))
                else:
                    break
            if not conds:
                raise SparqlParseError("empty ORDER BY", self.cur.pos)
            mods["order_by"] = conds
        # LIMIT/OFFSET in either order
        for _ in range(2):
            if self.at_kw("LIMIT"):
                self.take_kw("LIMIT")
                mods["limit"] = int(self.take("INTEGER").value)
            elif self.at_kw("OFFSET"):
                self.take_kw("OFFSET")
                mods["offset"] = int(self.take("INTEGER").value)
        return mods

    def parse_constraint(self):
        if self.at("("):
            self.take("(")
            e = self.parse_expression()
            self.take(")")
            return e
        return self.parse_primary_expression()

    # --- graph patterns ---
    def parse_group_graph_pattern(self) -> dict:
        self.take("{")
        if self.at_kw("SELECT"):
            sub = self.parse_select(sub=True)
            if self.at_kw("VALUES"):
                sub["values"] = self.parse_inline_data()
            self.take("}")
            return {"type": "subselect", "query": sub}
        patterns: list = []
        triples: list = []

        def flush() -> None:
            if triples:
                patterns.append({"type": "bgp", "triples": list(triples)})
                triples.clear()

        while not self.at("}"):
            if self.at_kw("OPTIONAL"):
                flush()
                self.take_kw("OPTIONAL")
                patterns.append({"type": "optional",
                                 "pattern": self.parse_group_graph_pattern()})
                self.opt(".")
            elif self.at_kw("MINUS"):
                flush()
                self.take_kw("MINUS")
                patterns.append({"type": "minus",
                                 "pattern": self.parse_group_graph_pattern()})
                self.opt(".")
            elif self.at_kw("GRAPH"):
                flush()
                self.take_kw("GRAPH")
                name = (
                    ("var", self.take("VAR").value[1:]) if self.at("VAR") else self.parse_iri()
                )
                patterns.append({"type": "graph", "name": name,
                                 "pattern": self.parse_group_graph_pattern()})
                self.opt(".")
            elif self.at_kw("SERVICE"):
                flush()
                self.take_kw("SERVICE")
                silent = bool(self.opt_kw("SILENT"))
                name = (
                    ("var", self.take("VAR").value[1:]) if self.at("VAR") else self.parse_iri()
                )
                patterns.append({"type": "service", "silent": silent, "name": name,
                                 "pattern": self.parse_group_graph_pattern()})
                self.opt(".")
            elif self.at_kw("FILTER"):
                flush()
                self.take_kw("FILTER")
                patterns.append({"type": "filter", "expr": self.parse_constraint()})
                self.opt(".")
            elif self.at_kw("BIND"):
                flush()
                self.take_kw("BIND")
                self.take("(")
                e = self.parse_expression()
                self.take_kw("AS")
                v = self.take("VAR").value[1:]
                self.take(")")
                patterns.append({"type": "bind", "expr": e, "var": v})
                self.opt(".")
            elif self.at_kw("VALUES"):
                flush()
                patterns.append(self.parse_inline_data())
                self.opt(".")
            elif self.at("{"):
                flush()
                left = self.parse_group_graph_pattern()
                while self.at_kw("UNION"):
                    self.take_kw("UNION")
                    right = self.parse_group_graph_pattern()
                    left = {"type": "union", "left": left, "right": right}
                patterns.append(left)
                self.opt(".")
            else:
                triples.extend(self.parse_triples_same_subject())
                if not self.opt("."):
                    if not self.at("}") and not self.at_kw(
                        "OPTIONAL", "MINUS", "GRAPH", "SERVICE", "FILTER",
                        "BIND", "VALUES",
                    ) and not self.at("{"):
                        raise SparqlParseError(
                            f"expected '.' or '}}', found {self.cur.value!r}",
                            self.cur.pos,
                        )
        self.take("}")
        flush()
        if len(patterns) == 1:
            return patterns[0]
        return {"type": "group", "patterns": patterns}

    def parse_inline_data(self) -> dict:
        self.take_kw("VALUES")
        if self.at("VAR"):
            vars_ = [self.take("VAR").value[1:]]
            self.take("{")
            rows = []
            while not self.at("}"):
                rows.append([self.parse_data_block_value()])
            self.take("}")
        else:
            if self.at("NIL"):
                self.take("NIL")
                vars_ = []
            else:
                self.take("(")
                vars_ = []
                while self.at("VAR"):
                    v = self.take("VAR").value[1:]
                    if v in vars_:
                        raise SparqlParseError(
                            f"duplicate variable ?{v} in VALUES", self.cur.pos
                        )
                    vars_.append(v)
                self.take(")")
            self.take("{")
            rows = []
            while not self.at("}"):
                if self.at("NIL"):
                    self.take("NIL")
                    rows.append([])
                    continue
                self.take("(")
                row = []
                while not self.at(")"):
                    row.append(self.parse_data_block_value())
                self.take(")")
                if len(row) != len(vars_):
                    raise SparqlParseError("VALUES row arity mismatch", self.cur.pos)
                rows.append(row)
            self.take("}")
        return {"type": "values", "vars": vars_, "rows": rows}

    def parse_data_block_value(self):
        if self.at_kw("UNDEF"):
            self.take_kw("UNDEF")
            return None
        if self.at("TT_OPEN"):
            return self.parse_triple_term(mode="data")
        t = self.parse_graph_term()
        return t

    # --- triples, paths, terms ---
    def parse_triples_block(self) -> list:
        triples = self.parse_triples_same_subject()
        while self.opt("."):
            if self.at("}") or self.at("EOF"):
                break
            triples.extend(self.parse_triples_same_subject())
        return triples

    def parse_triples_same_subject(self) -> list:
        acc: list = []
        if self.at("[") and not self.at("ANON"):
            # blank node property list as subject
            subj = self.parse_blank_node_property_list(acc)
            if not self._at_verb_start():
                return acc
        elif self.at("(") and not self.at("NIL"):
            subj = self.parse_collection(acc)
        elif self.at("RT_OPEN"):
            # reified triple as subject; property list optional
            subj = self.parse_reified_triple(acc)
            if not self._at_verb_start():
                return acc
        else:
            subj = self.parse_var_or_term(acc)
        self.parse_property_list(subj, acc)
        return acc

    def _at_verb_start(self) -> bool:
        return (
            self.at("VAR", "IRIREF", "PNAME_LN", "PNAME_NS", "A_KW", "(", "!", "^")
        )

    def parse_property_list(self, subj, acc: list) -> None:
        first = True
        while True:
            if not first and not self._at_verb_start():
                return
            verb = self.parse_verb()
            simple = not isinstance(verb, dict)
            while True:
                obj = self.parse_object(acc)
                acc.append((subj, verb, obj))
                # annotations / reifiers bind to the triple just emitted
                self.parse_annotations(subj, verb, obj, acc, simple)
                if not self.opt(","):
                    break
            if not self.opt(";"):
                return
            # allow trailing ';'
            while self.opt(";"):
                pass
            first = False

    def parse_verb(self):
        if self.at("VAR"):
            return ("var", self.take("VAR").value[1:])
        if self.at("A_KW"):
            self.take("A_KW")
            return RDF_TYPE
        return self.parse_path()

    # property paths (src/sparql/parser.ts:1628-1762)
    def parse_path(self):
        return self.parse_path_alternative()

    def parse_path_alternative(self):
        left = self.parse_path_sequence()
        while self.at("|"):
            self.take("|")
            right = self.parse_path_sequence()
            left = {"path": "alt", "left": left, "right": right}
        return left

    def parse_path_sequence(self):
        left = self.parse_path_elt_or_inverse()
        while self.at("/"):
            self.take("/")
            right = self.parse_path_elt_or_inverse()
            left = {"path": "seq", "left": left, "right": right}
        return left

    def parse_path_elt_or_inverse(self):
        if self.at("^"):
            self.take("^")
            return {"path": "inv", "inner": self.parse_path_elt()}
        return self.parse_path_elt()

    def parse_path_elt(self):
        prim = self.parse_path_primary()
        if self.at("?", "*", "+"):
            mod = self.cur.type
            self.i += 1
            return {"path": "mod", "mod": mod, "inner": prim}
        return prim

    def parse_path_primary(self):
        if self.at("A_KW"):
            self.take("A_KW")
            return RDF_TYPE
        if self.at("!"):
            self.take("!")
            return {"path": "neg", "set": self.parse_path_negated_set()}
        if self.at("("):
            self.take("(")
            p = self.parse_path()
            self.take(")")
            return p
        return self.parse_iri()

    def parse_path_negated_set(self) -> list:
        out = []

        def one():
            inv = bool(self.opt("^"))
            if self.at("A_KW"):
                self.take("A_KW")
                iri = RDF_TYPE
            else:
                iri = self.parse_iri()
            out.append({"inv": inv, "iri": iri})

        if self.at("("):
            self.take("(")
            if not self.at(")"):
                one()
                while self.opt("|"):
                    one()
            self.take(")")
        else:
            one()
        return out

    def parse_object(self, acc: list):
        if self.at("[") and not self.at("ANON"):
            return self.parse_blank_node_property_list(acc)
        if self.at("(") and not self.at("NIL"):
            return self.parse_collection(acc)
        return self.parse_var_or_term(acc)

    def parse_blank_node_property_list(self, acc: list):
        if self._inside_delete and self.strict_spec_notes:
            raise SparqlParseError("blank nodes not allowed in DELETE", self.cur.pos)
        self.take("[")
        node = self.fresh_bnode()
        self.parse_property_list(node, acc)
        self.take("]")
        return node

    def parse_collection(self, acc: list):
        self.take("(")
        elems = []
        while not self.at(")"):
            elems.append(self.parse_object(acc))
        self.take(")")
        if not elems:
            return ("iri", RDF + "nil")
        head = self.fresh_bnode()
        cur = head
        for k, e in enumerate(elems):
            acc.append((cur, ("iri", RDF + "first"), e))
            if k == len(elems) - 1:
                acc.append((cur, ("iri", RDF + "rest"), ("iri", RDF + "nil")))
            else:
                nxt = self.fresh_bnode()
                acc.append((cur, ("iri", RDF + "rest"), nxt))
                cur = nxt
        return head

    def parse_var_or_term(self, acc: Optional[list] = None):
        if self.at("VAR"):
            return ("var", self.take("VAR").value[1:])
        if self.at("RT_OPEN"):
            return self.parse_reified_triple(acc if acc is not None else [])
        if self.at("TT_OPEN"):
            return self.parse_triple_term(mode="pattern")
        return self.parse_graph_term()

    def parse_graph_term(self):
        t = self.cur
        if t.type == "IRIREF" or t.type in ("PNAME_LN", "PNAME_NS"):
            return self.parse_iri()
        if t.type == "BLANK_NODE_LABEL":
            if self._inside_delete and self.strict_spec_notes:
                raise SparqlParseError("blank nodes not allowed in DELETE", t.pos)
            self.i += 1
            return ("bnode", t.value)
        if t.type == "ANON":
            if self._inside_delete and self.strict_spec_notes:
                raise SparqlParseError("blank nodes not allowed in DELETE", t.pos)
            self.i += 1
            return self.fresh_bnode()
        if t.type in ("STRING2", "STRING1", "STRING_LONG2", "STRING_LONG1"):
            return self.parse_rdf_literal()
        if t.type == "INTEGER":
            self.i += 1
            return ("literal", t.value, None, XSD + "integer")
        if t.type == "DECIMAL":
            self.i += 1
            return ("literal", t.value, None, XSD + "decimal")
        if t.type == "DOUBLE":
            self.i += 1
            return ("literal", t.value, None, XSD + "double")
        if t.type == "BOOLEAN":
            self.i += 1
            return ("literal", t.value, None, XSD + "boolean")
        if t.type == "NIL":
            self.i += 1
            return ("iri", RDF + "nil")
        raise SparqlParseError(f"expected RDF term, found {t.value!r}", t.pos)

    def take_string(self) -> str:
        t = self.cur
        if t.type in ("STRING2", "STRING1"):
            self.i += 1
            return unescape_rdf_string(t.value[1:-1])
        if t.type in ("STRING_LONG2", "STRING_LONG1"):
            self.i += 1
            return unescape_rdf_string(t.value[3:-3])
        raise SparqlParseError(f"expected string, found {t.value!r}", t.pos)

    def parse_rdf_literal(self):
        val = self.take_string()
        if self.at("LANGTAG"):
            tag = self.take("LANGTAG").value[1:]
            return ("literal", val, tag, None)
        if self.at("HATHAT"):
            self.take("HATHAT")
            dt = self.parse_iri()
            return ("literal", val, None, dt[1])
        return ("literal", val, None, None)

    def iriref_value(self, tok: Tok) -> str:
        return tok.value[1:-1]

    def parse_iri(self) -> tuple:
        t = self.cur
        if t.type == "IRIREF":
            self.i += 1
            v = self.iriref_value(t)
            if self.base and ":" not in v:
                from ..parsing.iri import resolve_iri

                v = resolve_iri(v, self.base)
            return ("iri", v)
        if t.type == "PNAME_LN":
            self.i += 1
            ns, local = t.value.split(":", 1)
            if ns not in self.prefixes:
                self._undefined_prefix(ns, t)
            local = re.sub(r"\\(.)", r"\1", local)
            return ("iri", self.prefixes.get(ns, f"urn:undefined:{ns}:") + local)
        if t.type == "PNAME_NS":
            self.i += 1
            ns = t.value[:-1]
            if ns not in self.prefixes:
                self._undefined_prefix(ns, t)
            return ("iri", self.prefixes.get(ns, f"urn:undefined:{ns}:"))
        raise SparqlParseError(f"expected IRI, found {t.value!r}", t.pos)

    def _undefined_prefix(self, ns: str, tok: Tok) -> None:
        """Reference parity: UndefinedNamespacePrefixError is a SEMANTIC
        error — thrown in strict mode, collected in collecting mode
        (src/sparql/parser.ts:185-207 analogue; parse(tokens, false))."""
        if self.collect_prefix_errors:
            self.semantic_errors.append(
                {"name": "UndefinedNamespacePrefixError",
                 "message": f"Undefined prefix: {ns}",
                 "token": tok.value, "offset": tok.pos}
            )
        else:
            raise SparqlParseError(f"undefined prefix {ns!r}", tok.pos)

    # RDF 1.2: reified triples / triple terms / annotations
    def parse_reified_triple(self, acc: list):
        rt_pos = self.cur.pos
        self.take("RT_OPEN")
        if self.at("NIL"):
            raise SparqlParseError("() not allowed in a reified triple", self.cur.pos)
        s = self.parse_var_or_term(acc)
        if self.at("VAR"):
            p = ("var", self.take("VAR").value[1:])
        elif self.at("A_KW"):
            self.take("A_KW")
            p = RDF_TYPE
        else:
            p = self.parse_iri()
        if self.at("NIL"):
            raise SparqlParseError("() not allowed in a reified triple", self.cur.pos)
        o = self.parse_var_or_term(acc)
        reifier = None
        if self.at("~"):
            self.take("~")
            if self.at("VAR"):
                reifier = ("var", self.take("VAR").value[1:])
            elif self.at("IRIREF", "PNAME_LN", "PNAME_NS", "BLANK_NODE_LABEL", "ANON"):
                reifier = self.parse_graph_term()
        self.take("RT_CLOSE")
        if reifier is None and self._inside_delete and self.strict_spec_notes:
            raise SparqlParseError(
                "anonymous reifier not allowed in DELETE (spec note 7)", rt_pos
            )
        node = reifier if reifier is not None else self.fresh_bnode()
        acc.append((node, ("iri", RDF + "reifies"), ("tripleterm", (s, p, o))))
        return node

    def parse_triple_term(self, mode: str = "pattern"):
        """mode: 'pattern' (triples blocks — vars/ANON/nesting allowed in
        subject), 'expr' (BIND etc. — vars yes, fresh bnodes no), 'data'
        (VALUES / DATA blocks — ground terms only).  Context split derived
        from the w3c syntax-triple-terms pos/neg fixtures."""
        self.take("TT_OPEN")
        allow_vars = mode in ("pattern", "expr")

        def tt_subject():
            if self.at("VAR"):
                if not allow_vars:
                    raise SparqlParseError("variable not allowed here", self.cur.pos)
                return ("var", self.take("VAR").value[1:])
            if self.at("IRIREF", "PNAME_LN", "PNAME_NS"):
                return self.parse_iri()
            if self.at("BLANK_NODE_LABEL"):
                t = self.take("BLANK_NODE_LABEL")
                return ("bnode", t.value)
            if self.at("ANON") and mode == "pattern":
                self.take("ANON")
                return self.fresh_bnode()
            if self.at("TT_OPEN") and mode == "pattern":
                return self.parse_triple_term(mode)
            raise SparqlParseError(
                "invalid triple term subject in this context", self.cur.pos
            )

        def tt_object():
            if self.at("VAR"):
                if not allow_vars:
                    raise SparqlParseError("variable not allowed here", self.cur.pos)
                return ("var", self.take("VAR").value[1:])
            if self.at("TT_OPEN"):
                return self.parse_triple_term(mode)
            if self.at("NIL"):
                raise SparqlParseError("() not allowed in a triple term", self.cur.pos)
            if self.at("ANON") and mode != "pattern":
                raise SparqlParseError(
                    "anonymous blank node not allowed in this context", self.cur.pos
                )
            return self.parse_graph_term()

        s = tt_subject()
        if self.at("VAR"):
            p = ("var", self.take("VAR").value[1:])
        elif self.at("A_KW"):
            self.take("A_KW")
            p = RDF_TYPE
        else:
            p = self.parse_iri()
        o = tt_object()
        self.take("TT_CLOSE")
        return ("tripleterm", (s, p, o))

    def parse_annotations(self, s, p, o, acc: list, verb_is_simple: bool) -> None:
        last_reifier = None
        while self.at("~") or self.at("ANN_OPEN"):
            if self.strict_spec_notes and not verb_is_simple:
                raise SparqlParseError(
                    "annotation after property path verb (spec note 16)",
                    self.cur.pos,
                )
            if self.at("~"):
                self.take("~")
                if self.at("VAR"):
                    last_reifier = ("var", self.take("VAR").value[1:])
                elif self.at("IRIREF", "PNAME_LN", "PNAME_NS", "BLANK_NODE_LABEL", "ANON"):
                    last_reifier = self.parse_graph_term()
                else:
                    if self._inside_delete and self.strict_spec_notes:
                        raise SparqlParseError(
                            "anonymous reifier not allowed in DELETE", self.cur.pos
                        )
                    last_reifier = self.fresh_bnode()
                acc.append((last_reifier, ("iri", RDF + "reifies"),
                            ("tripleterm", (s, p, o))))
            else:
                self.take("ANN_OPEN")
                if last_reifier is None:
                    if self._inside_delete and self.strict_spec_notes:
                        raise SparqlParseError(
                            "annotation without explicit reifier not allowed in DELETE",
                            self.cur.pos,
                        )
                    last_reifier = self.fresh_bnode()
                    acc.append((last_reifier, ("iri", RDF + "reifies"),
                                ("tripleterm", (s, p, o))))
                self.parse_property_list(last_reifier, acc)
                self.take("ANN_CLOSE")
                last_reifier = None

    # --- expressions ---
    def parse_expression(self):
        return self.parse_or()

    def parse_or(self):
        left = self.parse_and()
        while self.at("OROR"):
            self.take("OROR")
            left = {"op": "||", "args": [left, self.parse_and()]}
        return left

    def parse_and(self):
        left = self.parse_relational()
        while self.at("ANDAND"):
            self.take("ANDAND")
            left = {"op": "&&", "args": [left, self.parse_relational()]}
        return left

    def parse_relational(self):
        left = self.parse_additive()
        if self.at("=", "NE", "<", ">", "LE", "GE"):
            op = {"=": "=", "NE": "!=", "<": "<", ">": ">", "LE": "<=", "GE": ">="}[
                self.cur.type
            ]
            self.i += 1
            return {"op": op, "args": [left, self.parse_additive()]}
        if self.at_kw("IN"):
            self.take_kw("IN")
            return {"op": "in", "args": [left] + self.parse_expression_list()}
        if self.at_kw("NOT"):
            self.take_kw("NOT")
            self.take_kw("IN")
            return {"op": "not in", "args": [left] + self.parse_expression_list()}
        return left

    def parse_expression_list(self) -> list:
        if self.at("NIL"):
            self.take("NIL")
            return []
        self.take("(")
        out = [self.parse_expression()]
        while self.opt(","):
            out.append(self.parse_expression())
        self.take(")")
        return out

    def parse_additive(self):
        left = self.parse_multiplicative()
        while True:
            if self.at("+"):
                self.take("+")
                left = {"op": "+", "args": [left, self.parse_multiplicative()]}
            elif self.at("-"):
                self.take("-")
                left = {"op": "-", "args": [left, self.parse_multiplicative()]}
            elif self.at("INTEGER", "DECIMAL", "DOUBLE") and self.cur.value[0] in "+-":
                # signed numeric literal acts as additive op (grammar note)
                t = self.cur
                self.i += 1
                dt = {"INTEGER": "integer", "DECIMAL": "decimal", "DOUBLE": "double"}[t.type]
                lit = ("literal", t.value.lstrip("+"), None, XSD + dt)
                left = {"op": "+", "args": [left, lit]}
            else:
                return left

    def parse_multiplicative(self):
        left = self.parse_unary()
        while self.at("*", "/"):
            op = self.cur.type
            self.i += 1
            left = {"op": op, "args": [left, self.parse_unary()]}
        return left

    def parse_unary(self):
        if self.at("!"):
            self.take("!")
            return {"op": "!", "args": [self.parse_unary()]}
        if self.at("+"):
            self.take("+")
            return self.parse_unary()
        if self.at("-"):
            self.take("-")
            return {"op": "neg", "args": [self.parse_unary()]}
        return self.parse_primary_expression()

    def parse_primary_expression(self):
        t = self.cur
        if t.type == "(":
            self.take("(")
            e = self.parse_expression()
            self.take(")")
            return e
        if t.type == "VAR":
            self.i += 1
            return ("var", t.value[1:])
        if t.type == "KW" and t.value in AGGREGATES:
            return self.parse_aggregate()
        if t.type == "KW" and t.value in BUILTIN_CALLS:
            return self.parse_builtin_call()
        if t.type == "KW" and t.value in ("EXISTS", "NOT"):
            neg = False
            if t.value == "NOT":
                self.take_kw("NOT")
                neg = True
            self.take_kw("EXISTS")
            return {"op": "exists", "neg": neg,
                    "pattern": self.parse_group_graph_pattern()}
        if t.type in ("STRING1", "STRING2", "STRING_LONG1", "STRING_LONG2",
                      "INTEGER", "DECIMAL", "DOUBLE", "BOOLEAN"):
            return self.parse_graph_term()
        if t.type == "TT_OPEN":
            return self.parse_triple_term(mode="expr")
        if t.type in ("IRIREF", "PNAME_LN", "PNAME_NS"):
            iri = self.parse_iri()
            if self.at("(") or self.at("NIL"):
                # function call with IRI function name (cast etc.)
                args = []
                distinct = False
                if self.at("NIL"):
                    self.take("NIL")
                else:
                    self.take("(")
                    if self.at_kw("DISTINCT"):
                        self.take_kw("DISTINCT")
                        distinct = True
                    args.append(self.parse_expression())
                    while self.opt(","):
                        args.append(self.parse_expression())
                    self.take(")")
                return {"op": "funcall", "iri": iri, "args": args,
                        "distinct": distinct}
            return iri
        raise SparqlParseError(f"expected expression, found {t.value!r}", t.pos)

    def parse_aggregate(self):
        if getattr(self, "_in_aggregate", False):
            raise SparqlParseError("aggregate calls cannot nest", self.cur.pos)
        self._in_aggregate = True
        try:
            return self._parse_aggregate_inner()
        finally:
            self._in_aggregate = False

    def _parse_aggregate_inner(self):
        name = self.take_kw(*AGGREGATES)
        self.take("(")
        distinct = bool(self.opt_kw("DISTINCT"))
        if name == "COUNT" and self.at("*"):
            self.take("*")
            arg = "*"
        else:
            arg = self.parse_expression()
        sep = None
        if name == "GROUP_CONCAT" and self.opt(";"):
            self.take_kw("SEPARATOR")
            self.take("=")
            sep = self.take_string()
        self.take(")")
        return {"op": "agg", "name": name, "arg": arg, "distinct": distinct,
                "separator": sep}

    def parse_builtin_call(self):
        name = self.take_kw(*BUILTIN_CALLS)
        if name == "BOUND":
            self.take("(")
            v = ("var", self.take("VAR").value[1:])
            self.take(")")
            return {"op": "call", "name": name, "args": [v]}
        if name in ("NOW", "RAND", "UUID", "STRUUID"):
            if self.at("NIL"):
                self.take("NIL")
            else:
                self.take("(")
                self.take(")")
            return {"op": "call", "name": name, "args": []}
        if name == "BNODE" and self.at("NIL"):
            self.take("NIL")
            return {"op": "call", "name": name, "args": []}
        self.take("(")
        args = [self.parse_expression()]
        while self.opt(","):
            args.append(self.parse_expression())
        self.take(")")
        return {"op": "call", "name": name, "args": args}

    # --- update (src/sparql/parser.ts:874-1130) ---
    def parse_update1(self) -> dict:
        if self.at_kw("LOAD"):
            self.take_kw("LOAD")
            silent = bool(self.opt_kw("SILENT"))
            iri = self.parse_iri()
            into = None
            if self.opt_kw("INTO"):
                self.take_kw("GRAPH")
                into = self.parse_iri()
            return {"op": "load", "silent": silent, "iri": iri, "into": into}
        if self.at_kw("CLEAR", "DROP"):
            op = self.take_kw("CLEAR", "DROP").lower()
            silent = bool(self.opt_kw("SILENT"))
            target = self.parse_graph_ref()
            return {"op": op, "silent": silent, "target": target}
        if self.at_kw("CREATE"):
            self.take_kw("CREATE")
            silent = bool(self.opt_kw("SILENT"))
            self.take_kw("GRAPH")
            return {"op": "create", "silent": silent, "iri": self.parse_iri()}
        if self.at_kw("ADD", "MOVE", "COPY"):
            op = self.take_kw("ADD", "MOVE", "COPY").lower()
            silent = bool(self.opt_kw("SILENT"))
            src = self.parse_graph_or_default()
            self.take_kw("TO")
            dst = self.parse_graph_or_default()
            return {"op": op, "silent": silent, "src": src, "dst": dst}
        if self.at_kw("INSERT", "DELETE", "WITH"):
            with_iri = None
            if self.opt_kw("WITH"):
                with_iri = self.parse_iri()
            if self.at_kw("INSERT"):
                self.take_kw("INSERT")
                if self.opt_kw("DATA"):
                    return {"op": "insertdata", "quads": self.parse_quad_data(False)}
                insert = self.parse_quad_pattern(False)
                using = self.parse_using()
                self.take_kw("WHERE")
                where = self.parse_group_graph_pattern()
                return {"op": "modify", "with": with_iri, "delete": None,
                        "insert": insert, "using": using, "where": where}
            self.take_kw("DELETE")
            if self.opt_kw("DATA"):
                return {"op": "deletedata", "quads": self.parse_quad_data(True)}
            if self.at_kw("WHERE"):
                self.take_kw("WHERE")
                quads = self.parse_quad_pattern(True)
                return {"op": "deletewhere", "quads": quads}
            delete = self.parse_quad_pattern(True)
            insert = None
            if self.opt_kw("INSERT"):
                insert = self.parse_quad_pattern(False)
            using = self.parse_using()
            self.take_kw("WHERE")
            where = self.parse_group_graph_pattern()
            return {"op": "modify", "with": with_iri, "delete": delete,
                    "insert": insert, "using": using, "where": where}
        raise SparqlParseError(f"expected update operation, found {self.cur.value!r}",
                               self.cur.pos)

    def parse_graph_ref(self):
        if self.opt_kw("DEFAULT"):
            return "default"
        if self.opt_kw("NAMED"):
            return "named"
        if self.opt_kw("ALL"):
            return "all"
        self.take_kw("GRAPH")
        return self.parse_iri()

    def parse_graph_or_default(self):
        if self.opt_kw("DEFAULT"):
            return "default"
        self.opt_kw("GRAPH")
        return self.parse_iri()

    def parse_using(self) -> list:
        out = []
        while self.at_kw("USING"):
            self.take_kw("USING")
            named = bool(self.opt_kw("NAMED"))
            out.append({"named": named, "iri": self.parse_iri()})
        return out

    def parse_quad_data(self, is_delete: bool) -> list:
        return self.parse_quad_pattern(is_delete)

    def parse_quad_pattern(self, is_delete: bool) -> list:
        prev = self._inside_delete
        self._inside_delete = is_delete
        try:
            self.take("{")
            quads = []
            while not self.at("}"):
                if self.at_kw("GRAPH"):
                    self.take_kw("GRAPH")
                    g = (
                        ("var", self.take("VAR").value[1:])
                        if self.at("VAR")
                        else self.parse_iri()
                    )
                    self.take("{")
                    while not self.at("}"):
                        for (s, p, o) in self.parse_triples_same_subject():
                            quads.append((s, p, o, g))
                        if not self.opt("."):
                            break
                    self.take("}")
                    self.opt(".")
                else:
                    for (s, p, o) in self.parse_triples_same_subject():
                        quads.append((s, p, o, None))
                    if not self.opt("."):
                        if not self.at("}") and not self.at_kw("GRAPH"):
                            raise SparqlParseError(
                                f"expected '.' in quad pattern, found {self.cur.value!r}",
                                self.cur.pos,
                            )
            self.take("}")
            return quads
        finally:
            self._inside_delete = prev

    def parse_construct_template(self) -> list:
        self.take("{")
        triples = []
        while not self.at("}"):
            triples.extend(self.parse_triples_same_subject())
            if not self.opt("."):
                break
        self.take("}")
        return triples


def parse_sparql(text: str, strict_spec_notes: bool = True) -> dict:
    """Parse a SPARQL 1.2 query or update string to the AST.

    Raises SparqlParseError on any lex/parse error (the reference's
    throwOnErrors mode; see parse_sparql_collecting for the other)."""
    resolved = resolve_codepoint_escapes(text)
    toks = tokenize(resolved)
    return Parser(toks, strict_spec_notes=strict_spec_notes).parse_unit()


def parse_sparql_collecting(text: str) -> dict:
    """Collecting mode (reference: ``parse(tokens, throwOnErrors=false)``,
    semanticErrors channel): undefined namespace prefixes are recorded
    and parsing continues with a placeholder IRI. Returns
    {'ast': dict | None, 'semantic_errors': [...], 'parse_error': str | None}."""
    out = {"ast": None, "semantic_errors": [], "parse_error": None}
    try:
        resolved = resolve_codepoint_escapes(text)
        toks = tokenize(resolved)
        p = Parser(toks, collect_prefix_errors=True)
        out["ast"] = p.parse_unit()
        out["semantic_errors"] = p.semantic_errors
    except SparqlParseError as e:
        out["parse_error"] = str(e)
    return out
