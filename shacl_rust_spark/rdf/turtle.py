"""Driver-side Turtle / N-Triples parser.

Implements the subset of the W3C Turtle grammar needed to load the
reference's conformance corpus and shapes graphs (the reference parses
RDF text with oxigraph, /root/reference/src/rdf.rs:21-57; rdflib is not
available in this container, so this is a from-scratch recursive-descent
parser over the public grammar). Shapes graphs are KBs — this parser
only ever runs on the driver; bulk data enters Spark via parquet/Iceberg
scans, never through here.

Supported: @prefix/@base (+ SPARQL-style PREFIX/BASE), IRIs (with
\\uXXXX/\\UXXXXXXXX escapes and relative resolution), prefixed names
(incl. reserved-char escapes), blank node labels and property lists,
collections, short/long single/double-quoted strings with escapes,
numeric shorthand (integer/decimal/double), boolean shorthand, ``a``,
datatyped (^^) and language-tagged literals, comments.
"""

from __future__ import annotations

import itertools
import re
from urllib.parse import urljoin

from ..term import Term, Triple, bnode, iri, literal
from .. import vocab
from .graph import Graph


class TurtleParseError(ValueError):
    pass


_IRIREF = re.compile(r"<([^<>\"{}|^`\\\x00-\x20]*)>")
_PNAME_NS = re.compile(r"((?:[A-Za-zÀ-￿][A-Za-z0-9_\-.À-￿]*)?):")
_BLANK = re.compile(r"_:([A-Za-z0-9_À-￿][A-Za-z0-9_\-.À-￿]*)")
_LANGTAG = re.compile(r"@([a-zA-Z]+(?:-[a-zA-Z0-9]+)*)")
_NUMBER = re.compile(
    r"[+-]?(?:\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)"
)
_PN_LOCAL_CHARS = re.compile(r"(?:[A-Za-z0-9_\-.:À-￿]|%[0-9A-Fa-f]{2}|\\[_~.\-!$&'()*+,;=/?#@%])*")
_STRING_ESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _decode_escapes(s: str, allow_string_escapes: bool = True) -> str:
    out: list[str] = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c != "\\" or i + 1 >= n:
            out.append(c)
            i += 1
            continue
        e = s[i + 1]
        if e == "u" and i + 6 <= n:
            out.append(chr(int(s[i + 2:i + 6], 16)))
            i += 6
        elif e == "U" and i + 10 <= n:
            out.append(chr(int(s[i + 2:i + 10], 16)))
            i += 10
        elif allow_string_escapes and e in _STRING_ESCAPES:
            out.append(_STRING_ESCAPES[e])
            i += 2
        else:
            out.append(e)  # reserved-char escape (PN_LOCAL) -> the char itself
            i += 2
    return "".join(out)


class TurtleParser:
    """Recursive-descent Turtle parser; `quads=True` additionally
    accepts an optional graph term before the statement dot (N-Quads),
    `trig=True` additionally accepts `[GRAPH] <g> { ... }` blocks
    (TriG). Graph labels are DISCARDED — the reference collapses quads
    into a single Graph (src/rdf.rs:55 Triple::from)."""

    def __init__(
        self,
        text: str,
        base_iri: str = "http://example.org",
        quads: bool = False,
        trig: bool = False,
    ):
        self.text = text
        self.pos = 0
        self.base = base_iri
        self.quads = quads
        self.trig = trig
        self.prefixes: dict[str, str] = {}
        self.graph = Graph()
        self._bnode_ids = itertools.count()
        self._bnode_labels: dict[str, Term] = {}

    # --- low-level ------------------------------------------------------
    def _ws(self) -> None:
        t, n = self.text, len(self.text)
        i = self.pos
        while i < n:
            c = t[i]
            if c in " \t\r\n":
                i += 1
            elif c == "#":
                while i < n and t[i] not in "\r\n":
                    i += 1
            else:
                break
        self.pos = i

    def _peek(self, s: str) -> bool:
        return self.text.startswith(s, self.pos)

    def _peek_keyword(self, kw: str) -> bool:
        if not self.text[self.pos:self.pos + len(kw)].lower() == kw.lower():
            return False
        after = self.pos + len(kw)
        return after >= len(self.text) or not (self.text[after].isalnum() or self.text[after] in "_:")

    def _expect(self, s: str) -> None:
        if not self._peek(s):
            raise TurtleParseError(
                f"expected {s!r} at offset {self.pos}: ...{self.text[self.pos:self.pos+40]!r}"
            )
        self.pos += len(s)

    def _match(self, rx: re.Pattern) -> re.Match | None:
        m = rx.match(self.text, self.pos)
        if m:
            self.pos = m.end()
        return m

    def _fresh_bnode(self) -> Term:
        return bnode(f"b{next(self._bnode_ids)}")

    def _labeled_bnode(self, label: str) -> Term:
        if label not in self._bnode_labels:
            self._bnode_labels[label] = bnode(label)
        return self._bnode_labels[label]

    # --- grammar --------------------------------------------------------
    def parse(self) -> Graph:
        self._ws()
        while self.pos < len(self.text):
            if self._peek("@prefix") or self._peek("@base"):
                self._directive(at_style=True)
            elif self._peek_keyword("prefix") or self._peek_keyword("base"):
                self._directive(at_style=False)
            elif self.trig and (
                self._peek("{") or self._peek_keyword("graph")
            ):
                self._trig_block()
            elif self.trig and self._trig_labeled_block():
                pass
            else:
                self._triples()
                self._ws()
                if self.quads and not self._peek("."):
                    self._graph_label_term()  # N-Quads: discard graph term
                    self._ws()
                self._expect(".")
            self._ws()
        return self.graph

    def _graph_label_term(self) -> None:
        m = self._match(_BLANK)
        if m is None:
            self._iri_term()

    def _trig_labeled_block(self) -> bool:
        """`<g> { ... }` TriG block without the GRAPH keyword. Returns
        False (without consuming) when the statement is plain triples."""
        saved = self.pos
        try:
            self._graph_label_term()
            self._ws()
        except TurtleParseError:
            self.pos = saved
            return False
        if not self._peek("{"):
            self.pos = saved
            return False
        self._graph_body()
        return True

    def _trig_block(self) -> None:
        if self._peek_keyword("graph"):
            self.pos += 5
            self._ws()
            self._graph_label_term()
            self._ws()
        self._graph_body()

    def _graph_body(self) -> None:
        self._expect("{")
        self._ws()
        while not self._peek("}"):
            if self.pos >= len(self.text):
                raise TurtleParseError("unterminated TriG graph block")
            self._triples()
            self._ws()
            if self._peek("."):
                self.pos += 1
            self._ws()
        self.pos += 1

    def _directive(self, at_style: bool) -> None:
        is_prefix = self._peek("@prefix") or self._peek_keyword("prefix")
        self.pos += (7 if is_prefix else 5) if at_style else (6 if is_prefix else 4)
        self._ws()
        if is_prefix:
            m = self._match(_PNAME_NS)
            if not m:
                raise TurtleParseError(f"bad prefix declaration at {self.pos}")
            name = m.group(1)
            self._ws()
            mi = self._match(_IRIREF)
            if not mi:
                raise TurtleParseError(f"bad prefix IRI at {self.pos}")
            self.prefixes[name] = self._resolve(_decode_escapes(mi.group(1), False))
        else:
            self._ws()
            mi = self._match(_IRIREF)
            if not mi:
                raise TurtleParseError(f"bad base IRI at {self.pos}")
            self.base = self._resolve(_decode_escapes(mi.group(1), False))
        self._ws()
        if at_style:
            self._expect(".")

    def _resolve(self, ref: str) -> str:
        if re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", ref):
            return ref
        return urljoin(self.base, ref)

    def _triples(self) -> None:
        self._ws()
        if self._peek("["):
            subj = self._bnode_property_list()
            self._ws()
            if not self._peek("."):
                self._predicate_object_list(subj)
        else:
            subj = self._subject()
            self._predicate_object_list(subj)

    def _predicate_object_list(self, subj: Term) -> None:
        while True:
            self._ws()
            pred = self._predicate()
            while True:
                self._ws()
                obj = self._object()
                self.graph.add(Triple(subj, pred, obj))
                self._ws()
                if self._peek(","):
                    self.pos += 1
                    continue
                break
            if self._peek(";"):
                while self._peek(";"):  # tolerate ;; and trailing ;
                    self.pos += 1
                    self._ws()
                if self._peek(".") or self._peek("]"):
                    return
                continue
            return

    def _subject(self) -> Term:
        self._ws()
        if self._peek("("):
            return self._collection()
        m = self._match(_BLANK)
        if m:
            return self._labeled_bnode(m.group(1))
        return self._iri_term()

    def _predicate(self) -> str:
        self._ws()
        if self._peek("a") and (
            self.pos + 1 >= len(self.text) or self.text[self.pos + 1] in " \t\r\n<#"
        ):
            self.pos += 1
            return vocab.RDF_TYPE
        t = self._iri_term()
        return t.value

    def _object(self) -> Term:
        self._ws()
        c = self.text[self.pos] if self.pos < len(self.text) else ""
        if c == "(":
            return self._collection()
        if c == "[":
            return self._bnode_property_list()
        if c in "\"'":
            return self._literal()
        m = self._match(_BLANK)
        if m:
            return self._labeled_bnode(m.group(1))
        if c.isdigit() or c in "+-." and _NUMBER.match(self.text, self.pos):
            return self._numeric_literal()
        if self._peek_keyword("true"):
            self.pos += 4
            return literal("true", vocab.XSD_BOOLEAN)
        if self._peek_keyword("false"):
            self.pos += 5
            return literal("false", vocab.XSD_BOOLEAN)
        return self._iri_term()

    def _iri_term(self) -> Term:
        m = self._match(_IRIREF)
        if m:
            return iri(self._resolve(_decode_escapes(m.group(1), False)))
        m = self._match(_PNAME_NS)
        if m:
            ns = m.group(1)
            if ns not in self.prefixes:
                raise TurtleParseError(f"undeclared prefix {ns!r}: at {self.pos}")
            lm = _PN_LOCAL_CHARS.match(self.text, self.pos)
            local = lm.group(0) if lm else ""
            # PN_LOCAL must not end with '.' — give trailing dots back
            while local.endswith("."):
                local = local[:-1]
            self.pos += len(local)
            return iri(self.prefixes[ns] + _decode_escapes(local, False))
        raise TurtleParseError(
            f"expected IRI at offset {self.pos}: ...{self.text[self.pos:self.pos+40]!r}"
        )

    def _numeric_literal(self) -> Term:
        m = self._match(_NUMBER)
        assert m
        lex = m.group(0)
        # '1.' directly before statement-terminating dot: give the dot back
        if lex.endswith(".") and "e" not in lex.lower():
            lex = lex[:-1]
            self.pos -= 1
        if "e" in lex.lower():
            dt = vocab.XSD_DOUBLE
        elif "." in lex:
            dt = vocab.XSD_DECIMAL
        else:
            dt = vocab.XSD_INTEGER
        return literal(lex, dt)

    def _literal(self) -> Term:
        q = self.text[self.pos]
        long_q = q * 3
        if self._peek(long_q):
            end = self.text.find(long_q, self.pos + 3)
            while end != -1 and self.text[end - 1] == "\\" and self.text[end - 2] != "\\":
                end = self.text.find(long_q, end + 1)
            if end == -1:
                raise TurtleParseError(f"unterminated long string at {self.pos}")
            raw = self.text[self.pos + 3:end]
            self.pos = end + 3
        else:
            i = self.pos + 1
            t, n = self.text, len(self.text)
            while i < n:
                if t[i] == "\\":
                    i += 2
                    continue
                if t[i] == q:
                    break
                if t[i] in "\r\n":
                    raise TurtleParseError(f"newline in short string at {i}")
                i += 1
            if i >= n:
                raise TurtleParseError(f"unterminated string at {self.pos}")
            raw = t[self.pos + 1:i]
            self.pos = i + 1
        value = _decode_escapes(raw)
        if self._peek("^^"):
            self.pos += 2
            dt = self._iri_term()
            return literal(value, dt.value)
        m = self._match(_LANGTAG)
        if m:
            return literal(value, lang=m.group(1).lower())
        return literal(value)

    def _collection(self) -> Term:
        self._expect("(")
        items: list[Term] = []
        while True:
            self._ws()
            if self._peek(")"):
                self.pos += 1
                break
            items.append(self._object())
        if not items:
            return iri(vocab.RDF_NIL)
        head = self._fresh_bnode()
        current = head
        for idx, item in enumerate(items):
            self.graph.add(Triple(current, vocab.RDF_FIRST, item))
            if idx + 1 < len(items):
                nxt = self._fresh_bnode()
                self.graph.add(Triple(current, vocab.RDF_REST, nxt))
                current = nxt
            else:
                self.graph.add(Triple(current, vocab.RDF_REST, iri(vocab.RDF_NIL)))
        return head

    def _bnode_property_list(self) -> Term:
        self._expect("[")
        node = self._fresh_bnode()
        self._ws()
        if self._peek("]"):
            self.pos += 1
            return node
        self._predicate_object_list(node)
        self._ws()
        self._expect("]")
        return node


def parse_turtle(text: str, base_iri: str = "http://example.org") -> Graph:
    """Parse Turtle text into a driver-side Graph.

    The default base matches the reference's read_graph_from_string
    (/root/reference/src/rdf.rs: base IRI "http://example.org").
    """
    return TurtleParser(text, base_iri).parse()


def parse_turtle_file(path: str) -> Graph:
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    return parse_turtle(text, base_iri=f"file://{path}")
