"""Driver-side JSON-LD parser (subset).

The reference accepts `jsonld` through oxigraph's parser
(/root/reference/src/rdf.rs:10-19,39-57); this is a from-scratch
implementation of the commonly-used JSON-LD core over the public spec:
inline @context (prefix and term definitions with @id/@type/@language/
@vocab/@base), node objects (@id/@type + properties), value objects
(@value/@type/@language), @list, @graph, nested node objects and
arrays. Remote contexts (string @context URLs) are NOT fetched — no
network in the engine — and raise JsonLdParseError.

Like every parser in this package it only ever runs on the driver for
shapes/config-sized documents; bulk data enters Spark via columnar
scans.
"""

from __future__ import annotations

import itertools
import json
import re

from ..term import Term, Triple, bnode, iri, literal
from .. import vocab
from .graph import Graph


class JsonLdParseError(ValueError):
    pass


_ABS_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")

_KEYWORDS = {
    "@context", "@id", "@type", "@value", "@language", "@list", "@set",
    "@graph", "@vocab", "@base", "@reverse", "@index", "@container",
}


class _Context:
    def __init__(self):
        self.terms: dict[str, dict] = {}
        self.vocab: str | None = None
        self.base: str | None = None

    def copy(self) -> "_Context":
        c = _Context()
        c.terms = dict(self.terms)
        c.vocab = self.vocab
        c.base = self.base
        return c


class JsonLdParser:
    def __init__(self, text: str, base_iri: str = "http://example.org"):
        self.text = text
        self.base = base_iri
        self.graph = Graph()
        self._bnode_ids = itertools.count()
        self._bnode_labels: dict[str, Term] = {}

    def _fresh_bnode(self) -> Term:
        return bnode(f"jb{next(self._bnode_ids)}")

    def _labeled_bnode(self, label: str) -> Term:
        if label not in self._bnode_labels:
            self._bnode_labels[label] = bnode(label)
        return self._bnode_labels[label]

    # --- context ---------------------------------------------------------
    def _parse_context(self, ctx_val, parent: _Context) -> _Context:
        ctx = parent.copy()
        if ctx_val is None:
            return _Context()
        entries = ctx_val if isinstance(ctx_val, list) else [ctx_val]
        for entry in entries:
            if isinstance(entry, str):
                raise JsonLdParseError(
                    f"remote @context {entry!r} is not supported (no network)"
                )
            if not isinstance(entry, dict):
                raise JsonLdParseError(f"bad @context entry {entry!r}")
            for key, val in entry.items():
                if key == "@vocab":
                    ctx.vocab = val
                elif key == "@base":
                    ctx.base = val
                elif key.startswith("@"):
                    continue
                elif isinstance(val, str):
                    ctx.terms[key] = {"@id": val}
                elif isinstance(val, dict):
                    ctx.terms[key] = val
                elif val is None:
                    ctx.terms.pop(key, None)
                else:
                    raise JsonLdParseError(f"bad term definition {key!r}")
        return ctx

    def _expand_iri(self, value: str, ctx: _Context, is_vocab: bool) -> str | None:
        """Term/CURIE/relative-IRI → absolute IRI (None: not expandable)."""
        if value in ctx.terms:
            mapped = ctx.terms[value].get("@id")
            if mapped is None:
                return None
            if mapped != value:
                return self._expand_iri(mapped, ctx, is_vocab)
            return mapped
        if ":" in value:
            pfx, local = value.split(":", 1)
            if local.startswith("//"):
                return value  # already absolute (http://...)
            if pfx in ctx.terms:
                base = ctx.terms[pfx].get("@id")
                if base:
                    return base + local
            if _ABS_IRI.match(value):
                return value
        if is_vocab and ctx.vocab:
            return ctx.vocab + value
        if not is_vocab:
            base = ctx.base or self.base
            if base:
                from urllib.parse import urljoin

                return urljoin(base, value)
        return None

    # --- nodes -----------------------------------------------------------
    def _node_subject(self, obj: dict, ctx: _Context) -> Term:
        nid = obj.get("@id")
        if nid is None:
            return self._fresh_bnode()
        if not isinstance(nid, str):
            raise JsonLdParseError(f"@id must be a string, got {nid!r}")
        if nid.startswith("_:"):
            return self._labeled_bnode(nid[2:])
        expanded = self._expand_iri(nid, ctx, is_vocab=False)
        if expanded is None:
            raise JsonLdParseError(f"cannot expand @id {nid!r}")
        return iri(expanded)

    def _parse_node(self, obj: dict, ctx: _Context) -> Term:
        if "@context" in obj:
            ctx = self._parse_context(obj["@context"], ctx)
        subj = self._node_subject(obj, ctx)
        for key, val in obj.items():
            if key in ("@context", "@id", "@index"):
                continue
            if key == "@type":
                for tv in val if isinstance(val, list) else [val]:
                    t = self._expand_iri(tv, ctx, is_vocab=True)
                    if t is None:
                        raise JsonLdParseError(f"cannot expand @type {tv!r}")
                    self.graph.add(Triple(subj, vocab.RDF_TYPE, iri(t)))
                continue
            if key == "@graph":
                # named-graph contents merge into the single output graph
                for item in val if isinstance(val, list) else [val]:
                    self._parse_node(item, ctx)
                continue
            if key == "@reverse":
                if not isinstance(val, dict):
                    raise JsonLdParseError("@reverse must be a map")
                for rk, rv in val.items():
                    pred = self._expand_iri(rk, ctx, is_vocab=True)
                    if pred is None:
                        raise JsonLdParseError(f"cannot expand {rk!r}")
                    for item in rv if isinstance(rv, list) else [rv]:
                        o = self._parse_object(item, ctx, {})
                        self.graph.add(Triple(o, pred, subj))
                continue
            if key.startswith("@"):
                raise JsonLdParseError(f"unsupported keyword {key}")
            term_def = ctx.terms.get(key, {})
            pred = self._expand_iri(key, ctx, is_vocab=True)
            if pred is None:
                continue  # non-expandable keys are dropped (spec behavior)
            for item in val if isinstance(val, list) else [val]:
                if isinstance(item, dict) and "@list" in item:
                    o = self._parse_list(item["@list"], ctx, term_def)
                else:
                    o = self._parse_object(item, ctx, term_def)
                self.graph.add(Triple(subj, pred, o))
        return subj

    def _parse_list(self, items, ctx: _Context, term_def: dict) -> Term:
        if not isinstance(items, list):
            items = [items]
        if not items:
            return iri(vocab.RDF_NIL)
        head = self._fresh_bnode()
        cur = head
        for idx, item in enumerate(items):
            self.graph.add(
                Triple(cur, vocab.RDF_FIRST, self._parse_object(item, ctx, term_def))
            )
            if idx + 1 < len(items):
                nxt = self._fresh_bnode()
                self.graph.add(Triple(cur, vocab.RDF_REST, nxt))
                cur = nxt
            else:
                self.graph.add(Triple(cur, vocab.RDF_REST, iri(vocab.RDF_NIL)))
        return head

    def _parse_object(self, item, ctx: _Context, term_def: dict) -> Term:
        if isinstance(item, dict):
            if "@value" in item:
                v = item["@value"]
                lang = item.get("@language")
                dt = item.get("@type")
                if dt is not None:
                    dt = self._expand_iri(dt, ctx, is_vocab=True)
                if isinstance(v, bool):
                    return literal("true" if v else "false",
                                   dt or vocab.XSD_BOOLEAN)
                if isinstance(v, int) and not isinstance(v, bool):
                    return literal(str(v), dt or vocab.XSD_INTEGER)
                if isinstance(v, float):
                    return literal(_fmt_double(v), dt or vocab.XSD_DOUBLE)
                if lang:
                    return literal(str(v), lang=lang.lower())
                return literal(str(v), dt or "")
            return self._parse_node(item, ctx)
        # term-coerced string values
        coerce = term_def.get("@type")
        if isinstance(item, str):
            if coerce == "@id":
                if item.startswith("_:"):
                    return self._labeled_bnode(item[2:])
                expanded = self._expand_iri(item, ctx, is_vocab=False)
                if expanded is None:
                    raise JsonLdParseError(f"cannot expand IRI value {item!r}")
                return iri(expanded)
            if coerce:
                dt = self._expand_iri(coerce, ctx, is_vocab=True)
                return literal(item, dt or "")
            lang = term_def.get("@language")
            if lang:
                return literal(item, lang=lang.lower())
            return literal(item)
        if isinstance(item, bool):
            return literal("true" if item else "false", vocab.XSD_BOOLEAN)
        if isinstance(item, int):
            return literal(str(item), vocab.XSD_INTEGER)
        if isinstance(item, float):
            return literal(_fmt_double(item), vocab.XSD_DOUBLE)
        if item is None:
            raise JsonLdParseError("null is not a valid object value")
        raise JsonLdParseError(f"unsupported value {item!r}")

    def parse(self) -> Graph:
        try:
            doc = json.loads(self.text)
        except json.JSONDecodeError as exc:
            raise JsonLdParseError(f"invalid JSON: {exc}") from exc
        ctx = _Context()
        if isinstance(doc, dict):
            self._parse_node(doc, ctx)
        elif isinstance(doc, list):
            for item in doc:
                if not isinstance(item, dict):
                    raise JsonLdParseError("top-level array must hold node objects")
                self._parse_node(item, ctx)
        else:
            raise JsonLdParseError("top-level JSON-LD must be an object or array")
        return self.graph


def _fmt_double(v: float) -> str:
    # canonical-ish double lexical form (1.0E0 style not required by the
    # engine's comparisons; repr keeps round-trip fidelity)
    return repr(v)


def parse_jsonld(text: str, base_iri: str = "http://example.org") -> Graph:
    return JsonLdParser(text, base_iri).parse()
