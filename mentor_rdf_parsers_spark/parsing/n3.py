"""N3 (Notation3) parser (lex + parse + read fused).

Re-creates the quad semantics of the reference's N3 module
(/root/reference/src/n3/{parser,reader}.ts):

* verb sugar (src/n3/reader.ts:251-302): ``a`` → rdf:type, ``=`` →
  owl:sameAs, ``=>`` → log:implies, ``<=`` → log:implies with
  subject/object swapped, ``has expr`` → expr, ``is expr of`` → expr
  swapped, ``<- expr`` → expr swapped;
* paths (src/n3/reader.ts:168-190): ``a!p`` emits ``a p _:pathN`` and
  evaluates to the fresh node; ``a^p`` emits ``_:pathN p a``; the counter
  is reader-global → per-document here;
* formulas ``{ … }`` (src/n3/reader.ts:859-897): a formula is a blank-node
  graph term whose ID comes from the ``{`` token; the formula's statements
  are re-emitted with that graph label — nested formulas are re-wrapped by
  each enclosing formula, so inner graph labels are clobbered by the
  outermost formula exactly like the reference;
* quickVars ``?x`` → variable terms (src/n3/reader.ts:901-906);
* ``@forAll`` / ``@forSome`` parse but emit nothing (src/n3/reader.ts:692-699);
* implicit empty prefix: an undeclared ``:x`` resolves against ``#``
  (src/n3/parser.ts:499-503, src/n3/reader.ts:360-368);
* zero-predicate statements (``:a .``) are valid and emit nothing;
* top-level SPARQL-style PREFIX/BASE directives are hoisted before all
  statements (reader n3Doc, src/n3/reader.ts:64-83) while ``@prefix`` /
  ``@base`` apply in statement order.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

from .lexer import Lexer, Token, default_bnode_generator
from .terms import (
    LOG_IMPLIES,
    OWL_SAMEAS,
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    Term,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
)
from .tokens import N3_TOKENS
from .turtle import ParseError, _Evaluator

QuadRec = Tuple[Term, Term, Term, Optional[Term], int, int, int]
ErrorRec = Tuple[str, int, str]

_N3_LEXER = Lexer(N3_TOKENS)

_IRI_START = ("IRIREF", "PNAME_LN", "PNAME_NS")
_LITERAL_START = (
    "INTEGER",
    "DECIMAL",
    "DOUBLE",
    "TRUE",
    "FALSE",
    "STRING_LITERAL_QUOTE",
    "STRING_LITERAL_SINGLE_QUOTE",
    "STRING_LITERAL_LONG_QUOTE",
    "STRING_LITERAL_LONG_SINGLE_QUOTE",
)
_STRING_TYPES = (
    "STRING_LITERAL_QUOTE",
    "STRING_LITERAL_SINGLE_QUOTE",
    "STRING_LITERAL_LONG_QUOTE",
    "STRING_LITERAL_LONG_SINGLE_QUOTE",
)
_EXPR_START = (
    ("LCURLY", "LPARENT", "LBRACKET", "QUICK_VAR", "BLANK_NODE_LABEL")
    + _IRI_START
    + _LITERAL_START
)
_VERB_START = ("A", "HAS", "IS", "EQUALS_SIGN", "IMPLIED_BY", "IMPLIES", "INVERSE_OF") + _EXPR_START


class _N3Parser:
    """Recursive descent — grammar per src/n3/parser.ts:146-520."""

    def __init__(self, tokens: List[Token], strict: bool):
        self.toks = tokens
        self.i = 0
        self.strict = strict
        self.namespaces: dict[str, bool] = {}
        self.semantic_errors: List[ErrorRec] = []

    def peek(self, k: int = 0) -> Optional[Token]:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def at(self, *types: str) -> bool:
        t = self.peek()
        return t is not None and t.type in types

    def expect(self, ttype: str) -> Token:
        t = self.peek()
        if t is None or t.type != ttype:
            got = t.type if t else "EOF"
            off = t.start if t else (self.toks[-1].start if self.toks else 0)
            raise ParseError(off, f"expected {ttype}, got {got}")
        self.i += 1
        return t

    def _err_offset(self) -> int:
        t = self.peek()
        return t.start if t else (self.toks[-1].start if self.toks else 0)

    # --- document -----------------------------------------------------------

    def parse_doc(self) -> List[tuple]:
        items: List[tuple] = []
        while self.peek() is not None:
            t = self.peek()
            if t.type in ("PREFIX", "BASE"):
                items.append(("sparql_directive", self.sparql_directive()))
            else:
                stmt = self.n3_statement()
                self.expect("PERIOD")
                items.append(("statement", stmt))
        return items

    def sparql_directive(self) -> tuple:
        t = self.peek()
        if t.type == "PREFIX":
            self.i += 1
            pname = self.expect("PNAME_NS")
            iri = self.expect("IRIREF")
            prefix = pname.image[:-1]
            self.namespaces[prefix] = True
            return ("prefix", prefix, iri.image)
        self.expect("BASE")
        iri = self.expect("IRIREF")
        return ("base", iri.image)

    def n3_statement(self) -> tuple:
        t = self.peek()
        if t is None:
            raise ParseError(self._err_offset(), "expected statement")
        if t.type == "TTL_PREFIX":
            self.i += 1
            pname = self.expect("PNAME_NS")
            iri = self.expect("IRIREF")
            prefix = pname.image[:-1]
            self.namespaces[prefix] = True
            return ("prefix", prefix, iri.image)
        if t.type == "TTL_BASE":
            self.i += 1
            iri = self.expect("IRIREF")
            return ("base", iri.image)
        if t.type in ("FORALL", "FORSOME"):
            self.i += 1
            self.iri()
            while self.at("COMMA"):
                self.i += 1
                self.iri()
            return ("quantifier",)
        return self.triples()

    def triples(self) -> tuple:
        subj = self.expression()
        pol = self.predicate_object_list() if self.at(*_VERB_START) else None
        return ("triples", subj, pol)

    # --- verbs ----------------------------------------------------------------

    def predicate_object_list(self) -> list:
        pairs = [(self.verb(), self.object_list())]
        while self.at("SEMICOLON"):
            self.i += 1
            if self.at(*_VERB_START):
                pairs.append((self.verb(), self.object_list()))
        return pairs

    def verb(self) -> tuple:
        t = self.peek()
        tt = t.type
        if tt == "A":
            self.i += 1
            return ("kw", RDF_TYPE, False, t.start)
        if tt == "HAS":
            self.i += 1
            return ("expr_verb", self.expression(), False, t.start)
        if tt == "IS":
            self.i += 1
            expr = self.expression()
            self.expect("OF")
            return ("expr_verb", expr, True, t.start)
        if tt == "EQUALS_SIGN":
            self.i += 1
            return ("kw", OWL_SAMEAS, False, t.start)
        if tt == "IMPLIED_BY":
            self.i += 1
            return ("kw", LOG_IMPLIES, True, t.start)
        if tt == "IMPLIES":
            self.i += 1
            return ("kw", LOG_IMPLIES, False, t.start)
        if tt == "INVERSE_OF":
            self.i += 1
            return ("expr_verb", self.expression(), True, t.start)
        return ("expr_verb", self.expression(), False, t.start)

    def object_list(self) -> list:
        items = [self.expression()]
        while self.at("COMMA"):
            self.i += 1
            items.append(self.expression())
        return items

    # --- expressions / paths ----------------------------------------------------

    def expression(self) -> tuple:
        return self.path()

    def path(self) -> tuple:
        item = self.path_item()
        if self.at("EXCL"):
            self.i += 1
            return ("path", item, "fwd", self.path())
        if self.at("CARET"):
            self.i += 1
            return ("path", item, "rev", self.path())
        return item

    def path_item(self) -> tuple:
        t = self.peek()
        if t is None:
            raise ParseError(self._err_offset(), "expected expression")
        tt = t.type
        if tt == "LCURLY":
            return self.formula()
        if tt == "LPARENT":
            return self.collection()
        if tt == "LBRACKET":
            nxt = self.peek(1)
            if nxt is not None and nxt.type == "RBRACKET":
                self.i += 2
                return ("anon", t)
            return self.blank_node_property_list()
        if tt == "QUICK_VAR":
            self.i += 1
            return ("quickvar", t.image[1:], t.start)
        if tt in _IRI_START:
            return self.iri()
        if tt == "BLANK_NODE_LABEL":
            self.i += 1
            return ("label_bnode", t)
        if tt in _LITERAL_START:
            return self.literal()
        raise ParseError(t.start, f"invalid expression: {tt}")

    def formula(self) -> tuple:
        lc = self.expect("LCURLY")
        items: List[tuple] = []
        # formulaContent ::= n3Statement ('.' formulaContent?)? | sparqlDirective formulaContent?
        while not self.at("RCURLY"):
            if self.peek() is None:
                raise ParseError(self._err_offset(), "unterminated formula")
            if self.at("PREFIX", "BASE"):
                items.append(("sparql_directive", self.sparql_directive()))
            else:
                items.append(("statement", self.n3_statement()))
                if self.at("PERIOD"):
                    self.i += 1
                else:
                    break  # trailing '.' is optional before '}'
        self.expect("RCURLY")
        return ("formula", items, lc)

    def collection(self) -> tuple:
        lp = self.expect("LPARENT")
        objects = []
        while not self.at("RPARENT"):
            if self.peek() is None:
                raise ParseError(self._err_offset(), "unterminated collection")
            objects.append(self.expression())
        self.expect("RPARENT")
        return ("collection", objects, lp)

    def blank_node_property_list(self) -> tuple:
        lb = self.expect("LBRACKET")
        pol = self.predicate_object_list()
        self.expect("RBRACKET")
        return ("bnpl", pol, lb)

    def iri(self) -> tuple:
        t = self.peek()
        if t is not None and t.type == "IRIREF":
            self.i += 1
            return ("iriref", t.image, t.start)
        if t is not None and t.type in ("PNAME_LN", "PNAME_NS"):
            self.i += 1
            colon = t.image.find(":")
            prefix = t.image[:colon] if colon > -1 else t.image
            if prefix not in self.namespaces:
                if prefix == "":
                    # implicit empty prefix (src/n3/parser.ts:499-503)
                    self.namespaces[""] = True
                else:
                    err = ("semantic", t.start, f"Undefined prefix: {prefix}")
                    if self.strict:
                        raise ParseError(t.start, err[2], stage="semantic")
                    self.semantic_errors.append(err)
            return ("pname", t.image, t.start)
        raise ParseError(self._err_offset(), "expected IRI")

    def literal(self) -> tuple:
        t = self.peek()
        tt = t.type
        if tt == "INTEGER":
            self.i += 1
            return ("num", t.image, XSD_INTEGER, t.start)
        if tt == "DECIMAL":
            self.i += 1
            return ("num", t.image, XSD_DECIMAL, t.start)
        if tt == "DOUBLE":
            self.i += 1
            return ("num", t.image, XSD_DOUBLE, t.start)
        if tt == "TRUE":
            self.i += 1
            return ("bool", "true", t.start)
        if tt == "FALSE":
            self.i += 1
            return ("bool", "false", t.start)
        if tt in _STRING_TYPES:
            self.i += 1
            from .terms import unescape_rdf_string

            if tt in ("STRING_LITERAL_LONG_QUOTE", "STRING_LITERAL_LONG_SINGLE_QUOTE"):
                raw = t.image[3:-3]
            else:
                raw = t.image[1:-1]
            value = unescape_rdf_string(raw)
            nxt = self.peek()
            if nxt is not None and nxt.type == "LANGTAG":
                self.i += 1
                return ("str", value, nxt.image[1:], None, t.start)
            if nxt is not None and nxt.type == "DCARET":
                self.i += 1
                dt = self.iri()
                return ("str", value, None, dt, t.start)
            return ("str", value, None, None, t.start)
        raise ParseError(t.start, f"invalid literal: {tt}")

    def skip_statement(self) -> None:
        depth = 0
        while self.peek() is not None:
            t = self.peek()
            self.i += 1
            if t.type in ("LBRACKET", "LPARENT", "LCURLY"):
                depth += 1
            elif t.type in ("RBRACKET", "RPARENT", "RCURLY"):
                depth = max(0, depth - 1)
            elif t.type == "PERIOD" and depth == 0:
                return


class _N3Evaluator(_Evaluator):
    """Shares IRI/literal machinery with Turtle; adds N3 semantics."""

    def __init__(self, skolem_prefix: Optional[str] = None):
        super().__init__({}, None, raw_label_images=False)
        self.path_counter = 0
        self.skolem_prefix = skolem_prefix

    def implicit_namespace(self, prefix: str) -> Optional[str]:
        # src/n3/reader.ts:360-368
        if prefix == "":
            self.ns[""] = "#"
            return "#"
        return None

    def _path_bnode(self) -> Term:
        n = self.path_counter
        self.path_counter += 1
        label = f"_path{n}"
        if self.skolem_prefix:
            label = f"{self.skolem_prefix}_{label}"
        return ("bnode", label)

    def eval_expr(self, ast: tuple, quads: list) -> Tuple[Term, int]:
        kind = ast[0]
        if kind == "path":
            _, item_ast, direction, rest_ast = ast
            node, off = self.eval_expr(item_ast, quads)
            prop, _ = self.eval_expr(rest_ast, quads)
            blank = self._path_bnode()
            if direction == "fwd":
                quads.append((node, prop, blank, None, off, off, off))
            else:
                quads.append((blank, prop, node, None, off, off, off))
            return blank, off
        if kind == "formula":
            return self.eval_formula(ast, quads)
        if kind == "collection":
            _, objects, lp = ast
            if not objects:
                return RDF_NIL, lp.start
            base_id = lp.bnode_id
            head = ("bnode", base_id)
            current = head
            for i, obj_ast in enumerate(objects):
                element, _ = self.eval_expr(obj_ast, quads)
                quads.append((current, RDF_FIRST, element, None, lp.start, lp.start, lp.start))
                if i < len(objects) - 1:
                    nxt = ("bnode", f"{base_id}-rest-{i + 1}")
                    quads.append((current, RDF_REST, nxt, None, lp.start, lp.start, lp.start))
                    current = nxt
                else:
                    quads.append((current, RDF_REST, RDF_NIL, None, lp.start, lp.start, lp.start))
            return head, lp.start
        if kind == "bnpl":
            _, pol, lb = ast
            subject = self.token_bnode(lb)
            for pred, obj, inverse, offs in self.eval_n3_pol(pol, quads):
                if inverse:
                    quads.append((obj, pred, subject, None, offs[1], offs[0], lb.start))
                else:
                    quads.append((subject, pred, obj, None, lb.start, offs[0], offs[1]))
            return subject, lb.start
        if kind == "quickvar":
            return ("var", ast[1]), ast[2]
        if kind == "label_bnode":
            tok = ast[1]
            return ("bnode", tok.bnode_id if tok.bnode_id is not None else tok.image[2:]), tok.start
        if kind == "anon":
            return self.token_bnode(ast[1]), ast[1].start
        if kind in ("iriref", "pname"):
            return self.eval_iri(ast), ast[2]
        if kind == "num":
            return ("literal", ast[1], None, ast[2]), ast[3]
        if kind == "bool":
            return ("literal", ast[1], None, XSD_BOOLEAN), ast[2]
        if kind == "str":
            _, value, lang, dt_ast, off = ast
            dt = self.eval_iri(dt_ast)[1] if dt_ast is not None else None
            return ("literal", value, lang, dt), off
        raise ParseError(-1, f"invalid n3 expression ast: {kind}")

    def eval_formula(self, ast: tuple, parent_quads: list) -> Tuple[Term, int]:
        # src/n3/reader.ts:859-897 — inner graph labels get clobbered by the
        # enclosing formula's node, replicated exactly.
        _, items, lc = ast
        formula_quads: list = []
        for item in items:
            if item[0] == "sparql_directive":
                self.apply_directive(item[1])
            else:
                self.process_statement(item[1], formula_quads)
        graph_node = self.token_bnode(lc)
        for (s, p, o, _g, so, po, oo) in formula_quads:
            parent_quads.append((s, p, o, graph_node, so, po, oo))
        return graph_node, lc.start

    def eval_n3_pol(self, pol: list, quads: list) -> list:
        result = []
        for verb_ast, obj_list in pol:
            vkind = verb_ast[0]
            if vkind == "kw":
                pred, inverse, v_off = verb_ast[1], verb_ast[2], verb_ast[3]
            else:
                pred, v_off = self.eval_expr(verb_ast[1], quads)
                inverse = verb_ast[2]
                v_off = verb_ast[3]
            for obj_ast in obj_list:
                obj, o_off = self.eval_expr(obj_ast, quads)
                result.append((pred, obj, inverse, (v_off, o_off)))
        return result

    def apply_directive(self, d: tuple) -> None:
        if d[0] == "prefix":
            self.ns[d[1]] = self.resolve(d[2])
        elif d[0] == "base":
            self.base = self.resolve(d[1])

    def process_statement(self, stmt: tuple, quads: list) -> None:
        kind = stmt[0]
        if kind in ("prefix", "base"):
            self.apply_directive(stmt)
            return
        if kind == "quantifier":
            return
        # triples
        _, subj_ast, pol = stmt
        subj, s_off = self.eval_expr(subj_ast, quads)
        if pol is None:
            return  # zero-predicate statement ':a .'
        for pred, obj, inverse, offs in self.eval_n3_pol(pol, quads):
            if inverse:
                quads.append((obj, pred, subj, None, offs[1], offs[0], s_off))
            else:
                quads.append((subj, pred, obj, None, s_off, offs[0], offs[1]))


def parse_n3(
    text: str,
    bnode_generator: Callable[[int, Token], str] = default_bnode_generator,
    strict: bool = True,
    skolem_prefix: Optional[str] = None,
) -> Tuple[List[QuadRec], List[ErrorRec]]:
    """Parse an N3 document into quad records + errors."""
    errors: List[ErrorRec] = []
    tokens, lex_errors = _N3_LEXER.tokenize(text, bnode_generator)
    for le in lex_errors:
        errors.append(("lex", le.offset, le.message))
    if strict and errors:
        return [], errors
    tokens = [t for t in tokens if t.type != "COMMENT"]

    parser = _N3Parser(tokens, strict=strict)
    items: List[tuple] = []
    try:
        items = parser.parse_doc()
    except ParseError as e:
        errors.append((e.stage, e.offset, e.message))
        if strict:
            return [], errors
        parser = _N3Parser(tokens, strict=False)
        items = []
        while parser.peek() is not None:
            mark = parser.i
            try:
                if parser.at("PREFIX", "BASE"):
                    items.append(("sparql_directive", parser.sparql_directive()))
                else:
                    stmt = parser.n3_statement()
                    parser.expect("PERIOD")
                    items.append(("statement", stmt))
            except ParseError as e2:
                errors.append((e2.stage, e2.offset, e2.message))
                if parser.i == mark:
                    parser.i += 1
                parser.skip_statement()
    errors.extend(parser.semantic_errors)
    if strict and errors:
        return [], errors

    ev = _N3Evaluator(skolem_prefix=skolem_prefix)
    quads: List[QuadRec] = []
    try:
        # SPARQL-style directives are hoisted (reader n3Doc, src/n3/reader.ts:64-83)
        for item in items:
            if item[0] == "sparql_directive":
                ev.apply_directive(item[1])
        for item in items:
            if item[0] == "statement":
                ev.process_statement(item[1], quads)
    except ParseError as e:
        errors.append((e.stage, e.offset, e.message))
        if strict:
            return [], errors

    if strict and errors:
        return [], errors
    return quads, errors
