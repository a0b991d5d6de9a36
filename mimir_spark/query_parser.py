"""Mimir query-string language over the positional algebra.

Entry point A of the reference is a parsed query string
(mimir-core/src/main/java/gate/mimir/search/query/parser/QueryParser.jj:119-136);
this module re-implements the same surface syntax as a small
tokenizer + recursive-descent parser producing an AST that executes
onto ``operators.hits`` combinators. Grammar coverage (productions at
QueryParser.jj:624-1255):

  term                     bare word, escaped specials, non-ASCII letters
  "quoted phrase"          sequence of terms; quoting neutralizes keywords
  index:term               named-index term query        (:925-975)
  {Type f=v f2>=5.4
        f3.REGEX("p","f")} annotation + constraints      (:836-918)
  q1 q2 ...                sequence (juxtaposition)      (:624-667)
  [n] / [m..n]             gap between sequence items    (:735-758)
  q1 | q2  /  OR           union                         (:1000-1199)
  q1 & q2  /  AND          minimal-interval intersection
  q1 IN q2, q1 OVER q2     containment joins
  q1 MINUS q2              hit difference
  q+n / q+m..n             bounded Kleene repeats        (:1208-1255)
  ( ... )                  grouping

Acceptance is tested against the reference's own 17-string corpus
(mimir-test/src/test/java/gate/mimir/test/TestQueryParser.java:51-147).

Semantic graft: document = conversation, token position = turn index,
so a bare term matches turns whose text contains the (downcased) word
— the 'string' token index analogue — and a quoted phrase matches
CONSECUTIVE TURNS, one word each, exactly as Mimir phrases match
consecutive tokens. ``index:term`` matches equality on a turn column
(the named-index analogue); ``{Type ...}`` resolves via a pluggable
annotation resolver (SemanticAnnotationHelper analogue).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators import hits as H

# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Term:
    value: str
    index: str | None = None  # named sub-index (column); None = text tokens


@dataclass(frozen=True)
class Ann:
    type: str
    constraints: tuple = ()  # (feature, op, value) triples


@dataclass(frozen=True)
class Seq:
    items: tuple
    gaps: tuple = ()  # (min, max) per junction; len == len(items) - 1


@dataclass(frozen=True)
class Bin:
    op: str  # OR | AND | IN | OVER | MINUS
    left: object = None
    right: object = None


@dataclass(frozen=True)
class Repeat:
    child: object
    m: int
    n: int


# ---------------------------------------------------------------------------
# tokenizer (QueryParser.jj token section :521-575)
# ---------------------------------------------------------------------------

_KEYWORDS = {"OR", "AND", "IN", "OVER", "MINUS", "REGEX"}

# whitespace is EXACTLY the index tokenizer's class (terms.WS_RE =
# [ \t\n\r]+), NOT \s: \s also eats NBSP/\x0b/unicode spaces, which
# the index keeps INSIDE a token — query-vs-index tokenization must
# agree character-for-character (tests/test_tokenizer_parity)
_TOKEN_RE = re.compile(
    r"""
      (?P<ws>[ \t\n\r]+)
    | (?P<string>"(?:\\.|[^"\\])*")
    | (?P<number>-?\d+(?:\.\d+)?)
    | (?P<dotdot>\.\.)
    | (?P<cmp><=|>=|<|>|=)
    | (?P<sym>[(){}\[\]:,|&+?.])
    | (?P<tok>(?:\\.|[^ \t\n\r(){}\[\]:,=<>|&+?."\\])+)
    """,
    re.VERBOSE,
)


@dataclass
class _Tok:
    kind: str
    text: str


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


def _lex(s: str) -> list[_Tok]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise QueryParseError(f"unexpected character {s[pos]!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group()
        if kind == "ws":
            continue
        if kind == "tok" and text in _KEYWORDS:
            out.append(_Tok("kw", text))
        else:
            out.append(_Tok(kind, text))
    return out


class QueryParseError(ValueError):
    pass


# ---------------------------------------------------------------------------
# recursive-descent parser
# ---------------------------------------------------------------------------

class _Parser:
    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> _Tok:
        t = self.peek()
        if t is None:
            raise QueryParseError("unexpected end of query")
        self.i += 1
        return t

    def expect(self, kind: str, text: str | None = None) -> _Tok:
        t = self.next()
        if t.kind != kind or (text is not None and t.text != text):
            raise QueryParseError(f"expected {text or kind}, got {t.text!r}")
        return t

    # query := seq ((OR|AND|IN|OVER|MINUS|'|'|'&') seq)*   left-assoc
    def query(self):
        node = self.seq()
        while True:
            t = self.peek()
            if t is None:
                return node
            op = None
            if t.kind == "kw" and t.text in {"OR", "AND", "IN", "OVER", "MINUS"}:
                op = t.text
            elif t.kind == "sym" and t.text == "|":
                op = "OR"
            elif t.kind == "sym" and t.text == "&":
                op = "AND"
            if op is None:
                return node
            self.next()
            node = Bin(op, node, self.seq())

    # seq := postfix (gap? postfix)*
    def seq(self):
        items, gaps = [self.postfix()], []
        while True:
            t = self.peek()
            if t is None:
                break
            if t.kind == "sym" and t.text == "[":
                gaps.append(self.gap())
                items.append(self.postfix())
                continue
            if self._starts_atom(t):
                gaps.append((0, 0))
                items.append(self.postfix())
                continue
            break
        if len(items) == 1:
            return items[0]
        return Seq(tuple(items), tuple(gaps))

    def _starts_atom(self, t: _Tok) -> bool:
        return (
            (t.kind == "sym" and t.text in "({")
            or t.kind in ("tok", "string", "number")
        )

    def _nonneg_int(self) -> int:
        t = self.expect("number")
        if "." in t.text or t.text.startswith("-"):
            raise QueryParseError(
                f"expected a non-negative integer, got {t.text!r}")
        return int(t.text)

    # gap := '[' n ('..' n)? ']'  (GapQuery production :735-758:
    # a single number is the max gap, min defaults to 0)
    def gap(self) -> tuple[int, int]:
        self.expect("sym", "[")
        hi = self._nonneg_int()
        lo = 0
        if self.peek() and self.peek().kind == "dotdot":
            self.next()
            lo = hi
            hi = self._nonneg_int()
        self.expect("sym", "]")
        if hi < lo:
            raise QueryParseError(f"gap range [{lo}..{hi}] is descending")
        return (lo, hi)

    # postfix := atom ('+' n ('..' n)?)?    (:1208-1255)
    def postfix(self):
        node = self.atom()
        t = self.peek()
        if t is not None and t.kind == "sym" and t.text == "+":
            self.next()
            m = self._nonneg_int()
            n = m
            if self.peek() and self.peek().kind == "dotdot":
                self.next()
                n = self._nonneg_int()
            if m < 1 or n < m:
                raise QueryParseError(f"invalid repeat bounds +{m}..{n}")
            node = Repeat(node, m, n)
        return node

    def atom(self):
        t = self.next()
        if t.kind == "sym" and t.text == "(":
            node = self.query()
            self.expect("sym", ")")
            return node
        if t.kind == "sym" and t.text == "{":
            return self.annotation()
        if t.kind == "string":
            # split EXACTLY like the index tokenizer (terms.WS_RE =
            # [ \t\n\r]+): Python str.split() also breaks on \x0b/
            # \x0c/unicode spaces, which the index keeps inside a
            # token — a quoted phrase must tokenize identically to
            # indexed text (QueryParser.jj:404-459 uses the indexing
            # tokenizer for quoted strings; tests/test_tokenizer_parity)
            words = [w for w in
                     re.split("[ \t\n\r]+", _unescape(t.text[1:-1])) if w]
            if not words:
                raise QueryParseError("empty quoted string")
            if len(words) == 1:
                return Term(words[0])
            return Seq(tuple(Term(w) for w in words),
                       tuple((0, 0) for _ in words[1:]))
        if t.kind in ("tok", "number"):
            value = _unescape(t.text)
            nxt = self.peek()
            if nxt is not None and nxt.kind == "sym" and nxt.text == ":":
                self.next()
                vt = self.next()
                if vt.kind not in ("tok", "number", "string"):
                    raise QueryParseError(f"bad named-index term {vt.text!r}")
                v = vt.text[1:-1] if vt.kind == "string" else vt.text
                return Term(_unescape(v), index=value)
            return Term(value)
        raise QueryParseError(f"unexpected token {t.text!r}")

    # annotation := '{' type (feature (op value | .REGEX(p[,f])))* '}'
    def annotation(self):
        ty = self.expect("tok").text
        cons = []
        while True:
            t = self.next()
            if t.kind == "sym" and t.text == "}":
                break
            if t.kind != "tok":
                raise QueryParseError(f"expected feature name, got {t.text!r}")
            feat = _unescape(t.text)
            nxt = self.next()
            if nxt.kind == "sym" and nxt.text == ".":
                self.expect("kw", "REGEX")
                self.expect("sym", "(")
                pat = _unescape(self.expect("string").text[1:-1])
                if self.peek() and self.peek().kind == "sym" \
                        and self.peek().text == ",":
                    self.next()
                    flags = _unescape(self.expect("string").text[1:-1])
                    pat = f"(?{flags}){pat}" if flags else pat
                self.expect("sym", ")")
                cons.append((feat, "REGEX", pat))
                continue
            if nxt.kind != "cmp":
                raise QueryParseError(f"expected comparator, got {nxt.text!r}")
            op = {"=": "EQ", "<": "LT", ">": "GT", "<=": "LE", ">=": "GE"}[nxt.text]
            vt = self.next()
            if vt.kind == "string":
                val: object = _unescape(vt.text[1:-1])
            elif vt.kind == "number":
                val = float(vt.text) if "." in vt.text else int(vt.text)
            elif vt.kind == "tok":
                val = _unescape(vt.text)
            else:
                raise QueryParseError(f"bad constraint value {vt.text!r}")
            cons.append((feat, op, val))
        return Ann(_unescape(ty), tuple(cons))


def parse(query: str):
    """Parse a Mimir query string into an AST node."""
    p = _Parser(_lex(query))
    node = p.query()
    if p.peek() is not None:
        raise QueryParseError(f"trailing input at {p.peek().text!r}")
    return node


# ---------------------------------------------------------------------------
# execution onto operators.hits
# ---------------------------------------------------------------------------

_WS_RE = "[ \\t\\n\\r]+"


def _default_resolver(turns: DataFrame, ann: Ann) -> DataFrame:
    """Built-in annotation types over the transcript schema — the
    SemanticAnnotationHelper analogue (SemanticAnnotationHelper.java:48-177):

    - {Turn f op v}:     typed constraints on turn columns
    - {Tool [name=x]}:   tool-call spans ('name' aliases the tool column)
    - {Document f op v}: conversation-level (DOCUMENT-mode) constraints
      over conversation_stats columns (n_turns, n_tool_turns, ...)
    """
    if ann.type == "Turn":
        return H.annotation_query(turns, list(ann.constraints))
    if ann.type == "Tool":
        cons = [("tool" if f == "name" else f, op, v)
                for f, op, v in ann.constraints]
        base = turns.filter(F.col("tool").isNotNull())
        return H.annotation_query(base, cons)
    if ann.type == "Document":
        pred = F.lit(True)
        for f, op, v in ann.constraints:
            pred = pred & H._CONSTRAINT_OPS[op](F.col(f), v)
        return H.document_query(turns, pred)
    raise QueryParseError(f"unknown annotation type {ann.type!r}")


def execute(node, turns: DataFrame, text_col: str = "text",
            resolver=None, term_index=None) -> DataFrame:
    """Run a parsed query over a turns DataFrame -> hits
    (conv_id, pos, len). ``term_index`` (a term -> hits callable, e.g.
    sources.token_index.indexed_term_resolver) swaps text-term leaves
    from corpus scans to postings lookups; all compound operators
    compose unchanged."""
    resolver = resolver or _default_resolver
    ex = lambda n: execute(n, turns, text_col, resolver,  # noqa: E731
                           term_index)

    if isinstance(node, Term):
        if node.index is not None:
            return H.term_query(turns, node.index, node.value)
        if term_index is not None:
            return term_index(node.value)
        toks = F.split(F.trim(F.lower(F.col(text_col))), _WS_RE)
        # downcase the query term with the SAME engine as the indexed
        # text (JVM F.lower, not Python str.lower): unicode case maps
        # differ between the two for a handful of code points (dotted
        # I, final sigma), and the reference guarantees query terms
        # are processed by the indexing TermProcessor chain
        # (doc/searching.tex:55-67) — tests/test_tokenizer_parity pins it
        return turns.filter(
            F.array_contains(toks, F.lower(F.lit(node.value)))
        ).select("conv_id", F.col("turn_idx").alias("pos"),
                 F.lit(1).alias("len"))
    if isinstance(node, Ann):
        return resolver(turns, node)
    if isinstance(node, Seq):
        return H.sequence([ex(i) for i in node.items], list(node.gaps))
    if isinstance(node, Repeat):
        return H.repeats_query(ex(node.child), node.m, node.n)
    if isinstance(node, Bin):
        l, r = ex(node.left), ex(node.right)
        if node.op == "OR":
            return H.or_query(l, r)
        if node.op == "AND":
            return H.and_query(l, r)
        if node.op == "IN":
            return H.within_query(l, r)
        if node.op == "OVER":
            return H.contains_query(l, r)
        if node.op == "MINUS":
            return H.minus_query(l, r)
    raise QueryParseError(f"cannot execute node {node!r}")


def run_query(query: str, turns: DataFrame, text_col: str = "text",
              resolver=None, term_index=None) -> DataFrame:
    """parse + execute in one call (QueryEngine.getQueryRunner(String)
    analogue, search/QueryEngine.java:434-441)."""
    return execute(parse(query), turns, text_col, resolver, term_index)


# ---------------------------------------------------------------------------
# canonical renderer (AST -> query string; parse(render(x)) == x)
# ---------------------------------------------------------------------------

_ESCAPE_RE = re.compile(r'([(){}\[\]:,=<>|&+?."\\ ])')


def _esc(s: str) -> str:
    if s in _KEYWORDS:  # keywords neutralize by quoting, as Mimir does
        return f'"{s}"'
    return _ESCAPE_RE.sub(r"\\\1", s)


def render(node) -> str:
    """Serialize an AST back to the query language. The output is fully
    parenthesized/escaped, so parse(render(x)) == x for every AST —
    the round-trip property the fuzz tests assert."""
    if isinstance(node, Term):
        if node.index is not None:
            return f"{_esc(node.index)}:{_esc(node.value)}"
        return _esc(node.value)
    if isinstance(node, Ann):
        parts = [_esc(node.type)]
        for feat, op, val in node.constraints:
            if op == "REGEX":
                parts.append(f'{_esc(feat)}.REGEX("{_q(val)}")')
                continue
            sym = {"EQ": "=", "LT": "<", "GT": ">", "LE": "<=", "GE": ">="}[op]
            if isinstance(val, str):
                parts.append(f'{_esc(feat)}{sym}"{_q(val)}"')
            else:
                parts.append(f"{_esc(feat)}{sym}{val}")
        return "{" + " ".join(parts) + "}"
    if isinstance(node, Seq):
        out = [render_grouped(node.items[0])]
        for (lo, hi), item in zip(node.gaps, node.items[1:]):
            if (lo, hi) != (0, 0):
                out.append(f"[{lo}..{hi}]")
            out.append(render_grouped(item))
        return " ".join(out)
    if isinstance(node, Repeat):
        return f"{render_grouped(node.child)}+{node.m}..{node.n}"
    if isinstance(node, Bin):
        return (f"{render_grouped(node.left)} {node.op} "
                f"{render_grouped(node.right)}")
    raise QueryParseError(f"cannot render {node!r}")


def _q(s: str) -> str:
    return str(s).replace("\\", "\\\\").replace('"', '\\"')


def render_grouped(node) -> str:
    """render with parens around compound nodes (keeps precedence)."""
    if isinstance(node, (Seq, Bin, Repeat)):
        return f"({render(node)})"
    return render(node)
