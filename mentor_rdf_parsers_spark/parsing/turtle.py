"""Turtle / TriG 1.2 parser (lex + parse + read fused, CST never materialized).

Re-creates the quad semantics of the reference's Turtle and TriG modules
(/root/reference/src/turtle/{parser,reader}.ts,
/root/reference/src/trig/{parser,reader}.ts) as a recursive-descent parse to
a lightweight statement AST followed by an evaluation pass that mirrors the
reference reader's visitor emission order exactly. Replicated behaviors:

* Turtle reader processes ALL directives before any triples
  (src/turtle/reader.ts:46-70): the LAST ``@prefix``/``@base`` wins for the
  whole document. TriG instead processes directives and blocks in source
  order (src/trig/reader.ts:63-104).
* The PARSER flags a prefix used before its declaration as a semantic error
  (src/turtle/parser.ts:185-207) even though the reader would resolve it —
  strict mode therefore rejects use-before-declare documents.
* Blank-node identity: pre-assigned lexer IDs (counter in token order,
  src/utils.ts:47-71). Turtle strips ``_:`` from labels via the assigned id
  (src/turtle/reader.ts:1252-1263); TriG keeps the raw image including
  ``_:`` (src/trig/reader.ts:1394-1398). Collection rest nodes derive
  ``{head}-rest-{i}`` (src/turtle/reader.ts:771-775).
* IRI resolution: unicode-unescape, any ':' → absolute as-is, '' → base,
  else WHATWG ``new URL(value, base).href`` (src/turtle/reader.ts:1230-1250)
  via :mod:`.iri`.
* Language tags keep their case (src/turtle/reader.ts:929-933) — unlike
  N-Triples/N-Quads.
* Numeric/boolean literals keep their lexical image verbatim with
  xsd:integer/decimal/double/boolean datatypes (src/turtle/reader.ts:900-920).
* RDF 1.2: reified triples emit ``reifier rdf:reifies <<(s p o)>>``
  (src/turtle/reader.ts:1014-1036); annotations pair each block with the
  preceding bare reifier or a fresh blank node, in source order
  (processAnnotation, src/turtle/reader.ts:1132-1220); triple terms are
  opaque terms (:mod:`.terms` encodes them canonically for the flat schema).
* TriG blocks stamp every quad emitted in their scope — including
  collection chains, property lists, reification and annotation quads —
  with the current graph (``_emitQuad``, src/trig/reader.ts:831-837).

Emission order mirrors the reference so the order-dependent canonical
comparison (src/helpers.ts:96-163) scores exact parity: side-effect quads of
subject/object evaluation precede the statement's own quads; annotation
quads follow their annotated quad.
"""

from __future__ import annotations

from typing import Callable, List, NamedTuple, Optional, Tuple

from .iri import resolve_iri
from .lexer import Lexer, Token, default_bnode_generator
from .terms import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REIFIES,
    RDF_REST,
    RDF_TYPE,
    Term,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    unescape_iri,
    unescape_local_name,
    unescape_rdf_string,
)
from .tokens import TRIG_TOKENS, TURTLE_TOKENS

QuadRec = Tuple[Term, Term, Term, Optional[Term], int, int, int]
ErrorRec = Tuple[str, int, str]

_TURTLE_LEXER = Lexer(TURTLE_TOKENS)
_TRIG_LEXER = Lexer(TRIG_TOKENS)

_IRI_START = ("IRIREF", "PNAME_LN", "PNAME_NS")
_PRED_START = ("A",) + _IRI_START
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


class ParseError(Exception):
    def __init__(self, offset: int, message: str, stage: str = "parse"):
        super().__init__(message)
        self.offset = offset
        self.message = message
        self.stage = stage


class _Parser:
    """Recursive descent over the token list → statement AST.

    Grammar mirrors src/turtle/parser.ts rules; ``trig=True`` adds the block
    productions of src/trig/parser.ts:123-233.
    """

    def __init__(self, tokens: List[Token], trig: bool, strict: bool):
        self.toks = tokens
        self.i = 0
        self.trig = trig
        self.strict = strict
        # parse-time namespace map for undefined-prefix semantic checks
        # (src/turtle/parser.ts:86-111,185-207)
        self.namespaces: dict[str, bool] = {}
        self.semantic_errors: List[ErrorRec] = []

    # --- token helpers ----------------------------------------------------

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

    # --- document ----------------------------------------------------------

    def parse_doc(self) -> List[tuple]:
        items: List[tuple] = []
        while self.peek() is not None:
            t = self.peek()
            if t.type in ("TTL_PREFIX", "PREFIX"):
                items.append(self.prefix_directive(t.type))
            elif t.type in ("TTL_BASE", "BASE"):
                items.append(self.base_directive(t.type))
            elif t.type in ("VERSION", "SPARQL_VERSION"):
                items.append(self.version_directive(t.type))
            elif self.trig:
                items.append(("block", self.block()))
            else:
                start_tok = t
                triples = self.triples()
                last_tok = self.toks[self.i - 1]
                self.expect("PERIOD")
                # statement source span (for comment lineage): first
                # token start → last pre-PERIOD token end
                span = (start_tok.start, last_tok.start + len(last_tok.image) - 1)
                items.append(("triples", triples, span))
        return items

    def prefix_directive(self, kw: str) -> tuple:
        self.expect(kw)
        pname = self.expect("PNAME_NS")
        iri = self.expect("IRIREF")
        if kw == "TTL_PREFIX":
            self.expect("PERIOD")
        prefix = pname.image[:-1]
        self.namespaces[prefix] = True
        return ("prefix", prefix, iri.image)

    def base_directive(self, kw: str) -> tuple:
        self.expect(kw)
        iri = self.expect("IRIREF")
        if kw == "TTL_BASE":
            self.expect("PERIOD")
        return ("base", iri.image)

    def version_directive(self, kw: str) -> tuple:
        self.expect(kw)
        t = self.peek()
        if t is not None and t.type in ("STRING_LITERAL_QUOTE", "STRING_LITERAL_SINGLE_QUOTE"):
            self.i += 1
        else:
            raise ParseError(self._err_offset(), "expected version specifier string")
        if kw == "VERSION":
            self.expect("PERIOD")
        return ("version",)

    # --- Turtle triples (src/turtle/parser.ts:127-150) ---------------------

    def triples(self) -> tuple:
        t = self.peek()
        if t is None:
            raise ParseError(self._err_offset(), "expected triples")
        if t.type == "LBRACKET":
            nxt = self.peek(1)
            if nxt is not None and nxt.type == "RBRACKET":
                subj = self.anon()
                pol = self.predicate_object_list()
                return ("t_subject", subj, pol)
            bnpl = self.blank_node_property_list()
            pol = self.predicate_object_list() if self._at_pred_start() else None
            return ("t_bnpl", bnpl, pol)
        if t.type == "OPEN_REIFIED_TRIPLE":
            rt = self.reified_triple()
            pol = self.predicate_object_list() if self._at_pred_start() else None
            return ("t_reified", rt, pol)
        subj = self.subject()
        pol = self.predicate_object_list()
        return ("t_subject", subj, pol)

    def _at_pred_start(self) -> bool:
        return self.at(*_PRED_START)

    def subject(self) -> tuple:
        t = self.peek()
        if t is None:
            raise ParseError(self._err_offset(), "expected subject")
        if t.type in _IRI_START:
            return self.iri()
        if t.type == "BLANK_NODE_LABEL":
            self.i += 1
            return ("label_bnode", t)
        if t.type == "LBRACKET":
            return self.anon()
        if t.type == "LPARENT":
            return self.collection()
        raise ParseError(t.start, f"invalid subject: {t.type}")

    def iri(self) -> tuple:
        t = self.peek()
        if t is not None and t.type == "IRIREF":
            self.i += 1
            return ("iriref", t.image, t.start)
        if t is not None and t.type in ("PNAME_LN", "PNAME_NS"):
            self.i += 1
            self._check_prefix(t)
            return ("pname", t.image, t.start)
        raise ParseError(self._err_offset(), "expected IRI")

    def _check_prefix(self, t: Token) -> None:
        # src/turtle/parser.ts:185-207
        colon = t.image.find(":")
        prefix = t.image[:colon] if colon > -1 else t.image
        if prefix not in self.namespaces and not self._implicit_prefix(prefix):
            err = ("semantic", t.start, f"Undefined prefix: {prefix}")
            if self.strict:
                raise ParseError(t.start, err[2], stage="semantic")
            self.semantic_errors.append(err)

    def _implicit_prefix(self, prefix: str) -> bool:
        return False  # N3 overrides (implicit '' → '#')

    def anon(self) -> tuple:
        lb = self.expect("LBRACKET")
        self.expect("RBRACKET")
        return ("anon", lb)

    def blank_node_property_list(self) -> tuple:
        lb = self.expect("LBRACKET")
        pol = self.predicate_object_list()
        self.expect("RBRACKET")
        return ("bnpl", pol, lb)

    def collection(self) -> tuple:
        lp = self.expect("LPARENT")
        objects = []
        while not self.at("RPARENT"):
            if self.peek() is None:
                raise ParseError(self._err_offset(), "unterminated collection")
            objects.append(self.object())
        self.expect("RPARENT")
        return ("collection", objects, lp)

    def predicate(self) -> tuple:
        t = self.peek()
        if t is not None and t.type == "A":
            self.i += 1
            return ("a", t.start)
        return self.iri()

    def predicate_object_list(self) -> list:
        pairs = [(self.predicate(), self.object_list())]
        while self.at("SEMICOLON"):
            self.i += 1
            if self._at_pred_start():
                pairs.append((self.predicate(), self.object_list()))
        return pairs

    def object_list(self) -> list:
        items = [(self.object(), self.annotation())]
        while self.at("COMMA"):
            self.i += 1
            items.append((self.object(), self.annotation()))
        return items

    def annotation(self) -> list:
        # annotation ::= (reifier | annotationBlock)*  — source order kept
        items = []
        while self.at("TILDE", "OPEN_ANNOTATION"):
            t = self.peek()
            if t.type == "TILDE":
                items.append(self.reifier())
            else:
                oa = self.expect("OPEN_ANNOTATION")
                pol = self.predicate_object_list()
                self.expect("CLOSE_ANNOTATION")
                items.append(("ablock", pol, oa))
        return items

    def reifier(self) -> tuple:
        tilde = self.expect("TILDE")
        t = self.peek()
        term = None
        if t is not None and t.type in _IRI_START:
            term = self.iri()
        elif t is not None and t.type == "BLANK_NODE_LABEL":
            self.i += 1
            term = ("label_bnode", t)
        elif t is not None and t.type == "LBRACKET" and self.peek(1) is not None and self.peek(1).type == "RBRACKET":
            term = self.anon()
        return ("reifier", term, tilde)

    def object(self) -> tuple:
        t = self.peek()
        if t is None:
            raise ParseError(self._err_offset(), "expected object")
        tt = t.type
        if tt in _IRI_START:
            return self.iri()
        if tt == "BLANK_NODE_LABEL":
            self.i += 1
            return ("label_bnode", t)
        if tt == "LBRACKET":
            nxt = self.peek(1)
            if nxt is not None and nxt.type == "RBRACKET":
                return self.anon()
            return self.blank_node_property_list()
        if tt == "LPARENT":
            return self.collection()
        if tt == "OPEN_TRIPLE_TERM":
            return self.triple_term()
        if tt == "OPEN_REIFIED_TRIPLE":
            return self.reified_triple()
        if tt in _LITERAL_START:
            return self.literal()
        raise ParseError(t.start, f"invalid object: {tt}")

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

    # --- RDF 1.2 (src/turtle/parser.ts:283-389) ----------------------------

    def reified_triple(self) -> tuple:
        op = self.expect("OPEN_REIFIED_TRIPLE")
        s = self.rt_subject()
        p = self.predicate()
        o = self.rt_object()
        reifier = self.reifier() if self.at("TILDE") else None
        self.expect("CLOSE_REIFIED_TRIPLE")
        return ("reified", s, p, o, reifier, op)

    def rt_subject(self) -> tuple:
        t = self.peek()
        if t is not None and t.type in _IRI_START:
            return self.iri()
        if t is not None and t.type == "BLANK_NODE_LABEL":
            self.i += 1
            return ("label_bnode", t)
        if t is not None and t.type == "LBRACKET":
            return self.anon()
        if t is not None and t.type == "OPEN_REIFIED_TRIPLE":
            return self.reified_triple()
        raise ParseError(self._err_offset(), "invalid reified-triple subject")

    def rt_object(self) -> tuple:
        t = self.peek()
        if t is not None and t.type in _IRI_START:
            return self.iri()
        if t is not None and t.type == "BLANK_NODE_LABEL":
            self.i += 1
            return ("label_bnode", t)
        if t is not None and t.type == "LBRACKET":
            return self.anon()
        if t is not None and t.type == "OPEN_TRIPLE_TERM":
            return self.triple_term()
        if t is not None and t.type == "OPEN_REIFIED_TRIPLE":
            return self.reified_triple()
        if t is not None and t.type in _LITERAL_START:
            return self.literal()
        raise ParseError(self._err_offset(), "invalid reified-triple object")

    def triple_term(self) -> tuple:
        op = self.expect("OPEN_TRIPLE_TERM")
        s = self.tt_subject()
        p = self.predicate()
        o = self.tt_object()
        self.expect("CLOSE_TRIPLE_TERM")
        return ("tripleterm", s, p, o, op)

    def tt_subject(self) -> tuple:
        t = self.peek()
        if t is not None and t.type in _IRI_START:
            return self.iri()
        if t is not None and t.type == "BLANK_NODE_LABEL":
            self.i += 1
            return ("label_bnode", t)
        if t is not None and t.type == "LBRACKET":
            return self.anon()
        raise ParseError(self._err_offset(), "invalid triple-term subject")

    def tt_object(self) -> tuple:
        t = self.peek()
        if t is not None and t.type in _IRI_START:
            return self.iri()
        if t is not None and t.type == "BLANK_NODE_LABEL":
            self.i += 1
            return ("label_bnode", t)
        if t is not None and t.type == "LBRACKET":
            return self.anon()
        if t is not None and t.type == "OPEN_TRIPLE_TERM":
            return self.triple_term()
        if t is not None and t.type in _LITERAL_START:
            return self.literal()
        raise ParseError(self._err_offset(), "invalid triple-term object")

    # --- TriG blocks (src/trig/parser.ts:123-233) ---------------------------

    def block(self) -> tuple:
        t = self.peek()
        if t.type == "GRAPH":
            self.i += 1
            label = self.label_or_subject()
            body = self.wrapped_graph()
            return ("graph", label, body)
        if t.type == "LCURLY":
            return ("default_wrapped", self.wrapped_graph())
        if t.type == "OPEN_REIFIED_TRIPLE":
            rt = self.reified_triple()
            pol = self.predicate_object_list() if self._at_pred_start() else None
            self.expect("PERIOD")
            return ("reified_triples", rt, pol)
        if t.type == "LBRACKET":
            nxt = self.peek(1)
            if nxt is not None and nxt.type == "RBRACKET":
                label = self.anon()
                return self._label_continuation(label)
            bnpl = self.blank_node_property_list()
            pol = self.predicate_object_list() if self._at_pred_start() else None
            self.expect("PERIOD")
            return ("triples2", ("t_bnpl", bnpl, pol))
        if t.type == "LPARENT":
            coll = self.collection()
            pol = self.predicate_object_list()
            self.expect("PERIOD")
            return ("triples2", ("t_subject", coll, pol))
        if t.type in _IRI_START or t.type == "BLANK_NODE_LABEL":
            label = self.label_or_subject()
            return self._label_continuation(label)
        raise ParseError(t.start, f"invalid block: {t.type}")

    def _label_continuation(self, label: tuple) -> tuple:
        if self.at("LCURLY"):
            body = self.wrapped_graph()
            return ("named", label, body)
        pol = self.predicate_object_list()
        self.expect("PERIOD")
        return ("subject_triples", label, pol)

    def label_or_subject(self) -> tuple:
        t = self.peek()
        if t is not None and t.type in _IRI_START:
            return self.iri()
        if t is not None and t.type == "BLANK_NODE_LABEL":
            self.i += 1
            return ("label_bnode", t)
        if t is not None and t.type == "LBRACKET":
            return self.anon()
        raise ParseError(self._err_offset(), "invalid graph label or subject")

    def wrapped_graph(self) -> list:
        self.expect("LCURLY")
        triples_list: List[tuple] = []
        if not self.at("RCURLY"):
            triples_list.append(self.triples())
            while self.at("PERIOD"):
                self.i += 1
                if self.at("RCURLY"):
                    break
                triples_list.append(self.triples())
        self.expect("RCURLY")
        return triples_list

    # --- recovery -----------------------------------------------------------

    def skip_statement(self) -> None:
        """Error recovery: skip past the next top-level PERIOD."""
        depth = 0
        while self.peek() is not None:
            t = self.peek()
            self.i += 1
            if t.type in ("LBRACKET", "LPARENT", "LCURLY", "OPEN_REIFIED_TRIPLE", "OPEN_TRIPLE_TERM", "OPEN_ANNOTATION"):
                depth += 1
            elif t.type in ("RBRACKET", "RPARENT", "RCURLY", "CLOSE_REIFIED_TRIPLE", "CLOSE_TRIPLE_TERM", "CLOSE_ANNOTATION"):
                depth = max(0, depth - 1)
            elif t.type == "PERIOD" and depth == 0:
                return


class _Evaluator:
    """Statement AST → quads, mirroring the reference reader visitors."""

    def __init__(
        self,
        namespaces: dict[str, str],
        base_iri: Optional[str],
        raw_label_images: bool,
    ):
        self.ns = namespaces
        self.base = base_iri
        self.raw_label_images = raw_label_images  # TriG/NT keep '_:' prefix
        self.current_graph: Optional[Term] = None

    # -- emission (TriG `_emitQuad` graph stamping, src/trig/reader.ts:831-837)

    def emit(self, quads: list, s: Term, p: Term, o: Term, offs=(-1, -1, -1)) -> None:
        quads.append((s, p, o, self.current_graph, offs[0], offs[1], offs[2]))

    # -- term evaluation ------------------------------------------------------

    def eval_iri(self, ast: tuple) -> Term:
        kind = ast[0]
        if kind == "iriref":
            return ("iri", self.resolve(ast[1]))
        if kind == "pname":
            image = ast[1]
            colon = image.find(":")
            prefix, local = image[:colon], image[colon + 1 :]
            ns = self.ns.get(prefix)
            if ns is None:
                ns = self.implicit_namespace(prefix)
                if ns is None:
                    raise ParseError(ast[2], f"Undefined prefix: {prefix}", stage="semantic")
            return ("iri", ns + unescape_local_name(local))
        raise ParseError(-1, f"not an IRI ast: {ast!r}")

    def implicit_namespace(self, prefix: str) -> Optional[str]:
        return None  # N3 overrides

    def resolve(self, image: str) -> str:
        """getNamedNode semantics (src/turtle/reader.ts:1230-1250)."""
        value = unescape_iri(image[1:-1])
        if ":" in value:
            return value
        if value == "" and self.base:
            return self.base
        if value != "" and self.base:
            return resolve_iri(value, self.base)
        return value

    def bnode_label(self, token: Token) -> Term:
        if self.raw_label_images:
            return ("bnode", token.image)
        return ("bnode", token.bnode_id if token.bnode_id is not None else token.image[2:])

    def token_bnode(self, token: Token) -> Term:
        return ("bnode", token.bnode_id if token.bnode_id is not None else f"anon{token.start}")

    def eval_subject(self, ast: tuple, quads: list) -> Tuple[Term, int]:
        kind = ast[0]
        if kind in ("iriref", "pname"):
            return self.eval_iri(ast), ast[2]
        if kind == "label_bnode":
            return self.bnode_label(ast[1]), ast[1].start
        if kind == "anon":
            return self.token_bnode(ast[1]), ast[1].start
        if kind == "collection":
            return self.eval_collection(ast, quads), ast[2].start
        raise ParseError(-1, f"invalid subject ast: {ast[0]}")

    def eval_predicate(self, ast: tuple) -> Tuple[Term, int]:
        if ast[0] == "a":
            return RDF_TYPE, ast[1]
        return self.eval_iri(ast), ast[2]

    def eval_object(self, ast: tuple, quads: list) -> Tuple[Term, int]:
        kind = ast[0]
        if kind in ("iriref", "pname"):
            return self.eval_iri(ast), ast[2]
        if kind == "label_bnode":
            return self.bnode_label(ast[1]), ast[1].start
        if kind == "anon":
            return self.token_bnode(ast[1]), ast[1].start
        if kind == "bnpl":
            return self.eval_bnpl(ast, quads), ast[2].start
        if kind == "collection":
            return self.eval_collection(ast, quads), ast[2].start
        if kind == "num":
            return ("literal", ast[1], None, ast[2]), ast[3]
        if kind == "bool":
            return ("literal", ast[1], None, XSD_BOOLEAN), ast[2]
        if kind == "str":
            _, value, lang, dt_ast, off = ast
            dt = self.eval_iri(dt_ast)[1] if dt_ast is not None else None
            return ("literal", value, lang, dt), off
        if kind == "tripleterm":
            return self.eval_triple_term(ast), ast[4].start
        if kind == "reified":
            return self.eval_reified(ast, quads), ast[5].start
        raise ParseError(-1, f"invalid object ast: {kind}")

    def eval_collection(self, ast: tuple, quads: list) -> Term:
        # src/turtle/reader.ts:745-785
        _, objects, lp = ast
        if not objects:
            return RDF_NIL
        base_id = lp.bnode_id
        head = ("bnode", base_id)
        current = head
        for i, obj_ast in enumerate(objects):
            element, _ = self.eval_object(obj_ast, quads)
            self.emit(quads, current, RDF_FIRST, element, (lp.start, lp.start, lp.start))
            if i < len(objects) - 1:
                nxt = ("bnode", f"{base_id}-rest-{i + 1}")
                self.emit(quads, current, RDF_REST, nxt, (lp.start, lp.start, lp.start))
                current = nxt
            else:
                self.emit(quads, current, RDF_REST, RDF_NIL, (lp.start, lp.start, lp.start))
        return head

    def eval_bnpl(self, ast: tuple, quads: list) -> Term:
        # src/turtle/reader.ts:865-881
        _, pol, lb = ast
        subject = self.token_bnode(lb)
        for pred, obj, ann, offs in self.eval_pol(pol, quads):
            self.emit(quads, subject, pred, obj, (lb.start, offs[0], offs[1]))
            self.process_annotation(ann, subject, pred, obj, quads)
        return subject

    def eval_triple_term(self, ast: tuple) -> Term:
        _, s_ast, p_ast, o_ast, _op = ast
        s, _ = self.eval_tt_term(s_ast)
        p, _ = self.eval_predicate(p_ast)
        o, _ = self.eval_tt_term(o_ast)
        return ("tripleterm", (s, p, o))

    def eval_tt_term(self, ast: tuple) -> Tuple[Term, int]:
        # triple-term components never have side effects
        return self.eval_object(ast, [])

    def eval_reified(self, ast: tuple, quads: list) -> Term:
        # src/turtle/reader.ts:1014-1036
        _, s_ast, p_ast, o_ast, reifier_ast, op = ast
        s, _ = self.eval_rt_term(s_ast, quads)
        p, _ = self.eval_predicate(p_ast)
        o, _ = self.eval_rt_term(o_ast, quads)
        if reifier_ast is not None:
            reifier = self.eval_reifier(reifier_ast)
        else:
            reifier = self.token_bnode(op)
        tt = ("tripleterm", (s, p, o))
        self.emit(quads, reifier, RDF_REIFIES, tt, (op.start, op.start, op.start))
        return reifier

    def eval_rt_term(self, ast: tuple, quads: list) -> Tuple[Term, int]:
        if ast[0] == "reified":
            return self.eval_reified(ast, quads), ast[5].start
        return self.eval_object(ast, quads)

    def eval_reifier(self, ast: tuple) -> Term:
        # reifier ::= '~' (iri | BlankNode)?  (src/turtle/reader.ts:1098-1109)
        _, term_ast, tilde = ast
        if term_ast is None:
            return self.token_bnode(tilde)
        if term_ast[0] == "label_bnode":
            return self.bnode_label(term_ast[1])
        if term_ast[0] == "anon":
            return self.token_bnode(term_ast[1])
        return self.eval_iri(term_ast)

    def eval_pol(self, pol: list, quads: list) -> list:
        """predicateObjectList visitor (src/turtle/reader.ts:843-863):
        evaluates everything (side-effect quads now), returns pairs."""
        result = []
        for pred_ast, obj_list in pol:
            pred, p_off = self.eval_predicate(pred_ast)
            for obj_ast, ann in obj_list:
                obj, o_off = self.eval_object(obj_ast, quads)
                result.append((pred, obj, ann, (p_off, o_off)))
        return result

    def process_annotation(self, ann: list, s: Term, p: Term, o: Term, quads: list) -> None:
        # src/turtle/reader.ts:1132-1220
        if not ann:
            return
        tt = ("tripleterm", (s, p, o))
        last_reifier: Optional[Term] = None
        for item in ann:
            if item[0] == "reifier":
                reifier = self.eval_reifier(item)
                off = item[2].start
                self.emit(quads, reifier, RDF_REIFIES, tt, (off, off, off))
                last_reifier = reifier
            else:  # ablock
                _, pol, oa = item
                if last_reifier is not None:
                    reifier = last_reifier
                    last_reifier = None
                else:
                    reifier = self.token_bnode(oa)
                    self.emit(quads, reifier, RDF_REIFIES, tt, (oa.start, oa.start, oa.start))
                for pred, obj, inner_ann, offs in self.eval_pol(pol, quads):
                    self.emit(quads, reifier, pred, obj, (oa.start, offs[0], offs[1]))
                    self.process_annotation(inner_ann, reifier, pred, obj, quads)

    # -- statements ------------------------------------------------------------

    def process_triples(self, ast: tuple, quads: list,
                        top: Optional[list] = None) -> None:
        """``top``: when given, collects the indices (into ``quads``) of
        the statement's TOP-LEVEL quads — the ones the reference's
        triplesInfo returns (src/turtle/reader.ts:240-300); inner
        collection/bnode/annotation quads are side-effects and excluded.
        Comment lineage attaches to the first/last top-level quad."""
        kind = ast[0]

        def mark() -> None:
            if top is not None:
                top.append(len(quads) - 1)

        if kind == "t_subject":
            _, subj_ast, pol = ast
            subj, s_off = self.eval_subject(subj_ast, quads)
            for pred, obj, ann, offs in self.eval_pol(pol, quads):
                self.emit(quads, subj, pred, obj, (s_off, offs[0], offs[1]))
                mark()
                self.process_annotation(ann, subj, pred, obj, quads)
        elif kind == "t_bnpl":
            _, bnpl_ast, pol = ast
            subj = self.eval_bnpl(bnpl_ast, quads)
            s_off = bnpl_ast[2].start
            if pol is not None:
                for pred, obj, ann, offs in self.eval_pol(pol, quads):
                    self.emit(quads, subj, pred, obj, (s_off, offs[0], offs[1]))
                    mark()
                    self.process_annotation(ann, subj, pred, obj, quads)
        elif kind == "t_reified":
            _, rt_ast, pol = ast
            reifier = self.eval_reified(rt_ast, quads)
            s_off = rt_ast[5].start
            if pol is not None:
                for pred, obj, ann, offs in self.eval_pol(pol, quads):
                    self.emit(quads, reifier, pred, obj, (s_off, offs[0], offs[1]))
                    mark()
                    self.process_annotation(ann, reifier, pred, obj, quads)
        else:
            raise ParseError(-1, f"invalid triples ast: {kind}")


def _directive_value(ev: _Evaluator, item: tuple) -> None:
    """Apply a directive to the evaluator state in document order."""
    if item[0] == "prefix":
        ev.ns[item[1]] = ev.resolve(item[2])
    elif item[0] == "base":
        ev.base = ev.resolve(item[1])
    # version: no-op


def parse_turtle(
    text: str,
    bnode_generator: Callable[[int, Token], str] = default_bnode_generator,
    strict: bool = True,
    trig: bool = False,
) -> Tuple[List[QuadRec], List[ErrorRec]]:
    """Parse a Turtle (or TriG) document into quad records + errors."""
    errors: List[ErrorRec] = []
    lexer = _TRIG_LEXER if trig else _TURTLE_LEXER
    tokens, lex_errors = lexer.tokenize(text, bnode_generator)
    for le in lex_errors:
        errors.append(("lex", le.offset, le.message))
    if strict and errors:
        return [], errors
    tokens = [t for t in tokens if t.type != "COMMENT"]

    parser = _Parser(tokens, trig=trig, strict=strict)
    items: List[tuple] = []
    try:
        items = parser.parse_doc()
    except ParseError as e:
        errors.append((e.stage, e.offset, e.message))
        if strict:
            return [], errors
        # non-strict: re-parse with recovery, statement by statement
        parser = _Parser(tokens, trig=trig, strict=False)
        items = []
        while parser.peek() is not None:
            mark = parser.i
            try:
                t = parser.peek()
                if t.type in ("TTL_PREFIX", "PREFIX"):
                    items.append(parser.prefix_directive(t.type))
                elif t.type in ("TTL_BASE", "BASE"):
                    items.append(parser.base_directive(t.type))
                elif t.type in ("VERSION", "SPARQL_VERSION"):
                    items.append(parser.version_directive(t.type))
                elif trig:
                    items.append(("block", parser.block()))
                else:
                    start_tok = t
                    tr = parser.triples()
                    last_tok = parser.toks[parser.i - 1]
                    parser.expect("PERIOD")
                    items.append(("triples", tr,
                                  (start_tok.start,
                                   last_tok.start + len(last_tok.image) - 1)))
            except ParseError as e2:
                errors.append((e2.stage, e2.offset, e2.message))
                if parser.i == mark:
                    parser.i += 1
                parser.skip_statement()
    errors.extend(parser.semantic_errors)
    if strict and errors:
        return [], errors

    ev = _Evaluator({}, None, raw_label_images=trig)
    quads: List[QuadRec] = []

    try:
        if trig:
            # TriG: directives and blocks interleaved in source order
            # (src/trig/reader.ts:63-104)
            for item in items:
                if item[0] in ("prefix", "base", "version"):
                    _directive_value(ev, item)
                elif item[0] == "block":
                    _process_trig_block(ev, item[1], quads)
        else:
            # Turtle: ALL directives first, then triples
            # (src/turtle/reader.ts:46-70)
            for item in items:
                if item[0] in ("prefix", "base", "version"):
                    _directive_value(ev, item)
            for item in items:
                if item[0] == "triples":
                    ev.process_triples(item[1], quads)
    except ParseError as e:
        errors.append((e.stage, e.offset, e.message))
        if strict:
            return [], errors

    if strict and errors:
        return [], errors
    return quads, errors


def _process_trig_block(ev: _Evaluator, block: tuple, quads: list) -> None:
    """Block dispatch — src/trig/reader.ts:701-830."""
    kind = block[0]
    if kind == "graph" or kind == "named":
        _, label_ast, body = block
        ev.current_graph = _eval_label(ev, label_ast)
        for t_ast in body:
            ev.process_triples(t_ast, quads)
        ev.current_graph = None
    elif kind == "default_wrapped":
        ev.current_graph = None
        for t_ast in block[1]:
            ev.process_triples(t_ast, quads)
    elif kind == "subject_triples":
        ev.current_graph = None
        _, label_ast, pol = block
        subj = _eval_label(ev, label_ast)
        s_off = _label_offset(label_ast)
        for pred, obj, ann, offs in ev.eval_pol(pol, quads):
            ev.emit(quads, subj, pred, obj, (s_off, offs[0], offs[1]))
            ev.process_annotation(ann, subj, pred, obj, quads)
    elif kind == "reified_triples":
        ev.current_graph = None
        _, rt_ast, pol = block
        reifier = ev.eval_reified(rt_ast, quads)
        if pol is not None:
            s_off = rt_ast[5].start
            for pred, obj, ann, offs in ev.eval_pol(pol, quads):
                ev.emit(quads, reifier, pred, obj, (s_off, offs[0], offs[1]))
                ev.process_annotation(ann, reifier, pred, obj, quads)
    elif kind == "triples2":
        ev.current_graph = None
        ev.process_triples(block[1], quads)
    else:
        raise ParseError(-1, f"invalid block ast: {kind}")


def _eval_label(ev: _Evaluator, ast: tuple) -> Term:
    if ast[0] == "label_bnode":
        return ev.bnode_label(ast[1])
    if ast[0] == "anon":
        return ev.token_bnode(ast[1])
    return ev.eval_iri(ast)


def _label_offset(ast: tuple) -> int:
    if ast[0] in ("label_bnode", "anon"):
        return ast[1].start
    return ast[2]


# --------------------------------------------------------------------------
# Quad contexts with comment lineage (src/turtle/reader.ts:124-231,
# src/quad-context.ts:10-43): per-statement leading/trailing comment
# attachment. Only the Turtle reader supports comments in the reference
# (the NT/TriG/N3 readQuadContexts variants take no token stream).


class QuadContextRec(NamedTuple):
    quad: QuadRec
    leading_comments: Tuple[str, ...]
    trailing_comment: Optional[str]


def read_quad_contexts(
    text: str,
    bnode_generator: Callable[[int, Token], str] = default_bnode_generator,
    strict: bool = True,
) -> Tuple[List[QuadContextRec], List[ErrorRec]]:
    """Parse a Turtle document into quads with comment lineage.

    Mirrors the reference's ``readQuadContexts(cst, tokens)``
    (src/turtle/reader.ts:124-231):

    * leading comments: every comment between the previous statement's
      end and this statement's first token, attached to the statement's
      FIRST top-level quad;
    * trailing comment: the next comment after the statement end on the
      SAME line, attached to the LAST top-level quad;
    * document-footer comments: attached to the last emitted quad —
      as its trailing comment if on the statement's end line and none is
      set yet, else appended to its leading comments;
    * inner collection/bnode-property-list/annotation quads carry no
      comments (the reference appends them as synthetic contexts; here
      they keep their real source offsets, which is strictly more
      lineage).

    Divergence note: the reference measures a statement's end as the
    max END offset of its top-level OBJECT tokens; this implementation
    uses the statement's last token before the closing PERIOD. The two
    agree except for multi-line annotation/reifier tails, where this
    version still attaches a same-line trailing comment.
    """
    errors: List[ErrorRec] = []
    comments: List[Token] = []
    tokens, lex_errors = _TURTLE_LEXER.tokenize(text, bnode_generator, comments)
    for le in lex_errors:
        errors.append(("lex", le.offset, le.message))
    if strict and errors:
        return [], errors

    parser = _Parser(tokens, trig=False, strict=strict)
    try:
        items = parser.parse_doc()
    except ParseError as e:
        errors.append((e.stage, e.offset, e.message))
        return [], errors
    errors.extend(parser.semantic_errors)
    if strict and errors:
        return [], errors

    newlines = [i for i, c in enumerate(text) if c == "\n"]

    def line_of(off: int) -> int:
        import bisect

        return bisect.bisect_left(newlines, off) + 1

    ev = _Evaluator({}, None, raw_label_images=False)
    for item in items:
        if item[0] in ("prefix", "base", "version"):
            _directive_value(ev, item)

    contexts: List[QuadContextRec] = []
    ci = 0
    prev_end = -1
    last_end_line = -1
    for item in items:
        if item[0] != "triples":
            continue
        stmt_quads: List[QuadRec] = []
        top: List[int] = []
        ev.process_triples(item[1], stmt_quads, top)
        if not stmt_quads:
            continue
        start_off, end_off = item[2]
        end_line = line_of(end_off)

        leading: List[str] = []
        while ci < len(comments):
            c = comments[ci]
            if c.start < start_off and c.start > prev_end:
                leading.append(c.image)
                ci += 1
            else:
                break
        trailing: Optional[str] = None
        if (
            ci < len(comments)
            and comments[ci].start > end_off
            and line_of(comments[ci].start) == end_line
        ):
            trailing = comments[ci].image
            ci += 1

        first_top = top[0] if top else 0
        last_top = top[-1] if top else len(stmt_quads) - 1
        for k, q in enumerate(stmt_quads):
            contexts.append(QuadContextRec(
                q,
                tuple(leading) if k == first_top else (),
                trailing if k == last_top else None,
            ))
        prev_end = end_off
        last_end_line = end_line

    # document footer (reference lines 186-198)
    if ci < len(comments) and contexts:
        last = contexts[-1]
        lead = list(last.leading_comments)
        trail = last.trailing_comment
        while ci < len(comments):
            if trail is None and line_of(comments[ci].start) == last_end_line:
                trail = comments[ci].image
            else:
                lead.append(comments[ci].image)
            ci += 1
        contexts[-1] = QuadContextRec(last.quad, tuple(lead), trail)
    return contexts, errors
