"""Tolerant JSON repair for LLM output.

Reimplements the semantics the reference relies on
(reference: experimental/components/entity_relation_extractor.py:54-111 and
the ``json_repair`` corpus exercised by
tests/unit/experimental/components/test_entity_relation_extractor.py:232-421):

* ``balance_curly_braces`` — drop unmatched ``}`` and append missing ``}``,
  string/escape aware.
* ``repair_json`` — lenient parse (unquoted keys, unquoted string values,
  trailing commas, excess braces, ``[}`` truncation) then re-serialize with
  standard ``json.dumps`` separators.  Stands in for the third-party
  ``json_repair.repair_json`` (not available in this environment).
* ``fix_invalid_json`` — wrapper raising :class:`InvalidJSONError` when the
  repair produced nothing usable (entity_relation_extractor.py:103-111).

These run inside Arrow-batched pandas UDFs, on strings that are only a few
KB each — per-string Python here is the semantics-critical slow path the
reference also pays.
"""

from __future__ import annotations

import json
from typing import Any


class InvalidJSONError(ValueError):
    """JSON could not be repaired into anything usable."""


def balance_curly_braces(json_string: str) -> str:
    """Balance ``{}`` outside string literals; extra ``}`` dropped, missing
    ``}`` appended (semantics of entity_relation_extractor.py:54-100)."""
    depth = 0
    out: list[str] = []
    in_string = False
    escaped = False
    for ch in json_string:
        if ch == '"' and not escaped:
            in_string = not in_string
        elif ch == "\\" and in_string:
            escaped = not escaped
            out.append(ch)
            continue
        else:
            escaped = False
        if in_string:
            out.append(ch)
            continue
        if ch == "{":
            depth += 1
            out.append(ch)
        elif ch == "}":
            if depth > 0:
                depth -= 1
                out.append(ch)
            # unmatched closing brace: skip it
        else:
            out.append(ch)
    out.append("}" * depth)
    return "".join(out)


_WS = " \t\n\r"
_BAREWORD_END = ",:]}" + _WS


class _LenientParser:
    """Recursive-descent parser accepting the malformed-JSON corpus above."""

    def __init__(self, s: str):
        self.s = s
        self.i = 0
        self.n = len(s)

    def _ws(self) -> None:
        while self.i < self.n and self.s[self.i] in _WS:
            self.i += 1

    def _peek(self) -> str:
        return self.s[self.i] if self.i < self.n else ""

    def parse(self) -> Any:
        self._ws()
        value = self._value()
        return value

    def _value(self) -> Any:
        self._ws()
        ch = self._peek()
        if ch == "{":
            return self._object()
        if ch == "[":
            return self._array()
        if ch == '"' or ch == "'":
            return self._string(ch)
        if ch == "":
            raise InvalidJSONError("unexpected end of input")
        return self._bareword()

    def _string(self, quote: str) -> str:
        assert self._peek() == quote
        self.i += 1
        out: list[str] = []
        while self.i < self.n:
            ch = self.s[self.i]
            if ch == "\\" and self.i + 1 < self.n:
                nxt = self.s[self.i + 1]
                mapping = {
                    '"': '"',
                    "'": "'",
                    "\\": "\\",
                    "/": "/",
                    "n": "\n",
                    "t": "\t",
                    "r": "\r",
                    "b": "\b",
                    "f": "\f",
                }
                if nxt == "u" and self.i + 5 < self.n:
                    try:
                        out.append(chr(int(self.s[self.i + 2 : self.i + 6], 16)))
                        self.i += 6
                        continue
                    except ValueError:
                        pass
                out.append(mapping.get(nxt, nxt))
                self.i += 2
                continue
            if ch == quote:
                self.i += 1
                return "".join(out)
            out.append(ch)
            self.i += 1
        # unterminated string: return what we have
        return "".join(out)

    def _bareword(self) -> Any:
        start = self.i
        while self.i < self.n and self.s[self.i] not in _BAREWORD_END:
            self.i += 1
        word = self.s[start : self.i].strip()
        if word == "true":
            return True
        if word == "false":
            return False
        if word in ("null", "None"):
            return None
        try:
            return int(word)
        except ValueError:
            pass
        try:
            return float(word)
        except ValueError:
            pass
        if not word:
            raise InvalidJSONError(f"empty value at offset {start}")
        return word  # unquoted string value → quoted on re-serialize

    def _object(self) -> Any:
        assert self._peek() == "{"
        self.i += 1
        self._ws()
        # excess-brace form {{...}}: parse inner value, swallow extra '}'
        if self._peek() == "{":
            inner = self._value()
            self._ws()
            while self._peek() == "}":
                self.i += 1
                self._ws()
            if isinstance(inner, dict):
                return inner
        obj: dict[str, Any] = {}
        while True:
            self._ws()
            ch = self._peek()
            if ch == "" or ch == "}":
                if ch == "}":
                    self.i += 1
                return obj
            if ch == ",":
                self.i += 1
                continue
            if ch == "]":  # stray — skip
                self.i += 1
                continue
            # key
            if ch == '"' or ch == "'":
                key = self._string(ch)
            else:
                start = self.i
                while self.i < self.n and self.s[self.i] not in ":" + _WS + ",}":
                    self.i += 1
                key = self.s[start : self.i]
            self._ws()
            if self._peek() == ":":
                self.i += 1
            else:
                raise InvalidJSONError(f"missing ':' after key {key!r}")
            self._ws()
            if self._peek() in ",}":
                raise InvalidJSONError(f"missing value for key {key!r}")
            obj[str(key)] = self._value()

    def _array(self) -> list[Any]:
        assert self._peek() == "["
        self.i += 1
        arr: list[Any] = []
        while True:
            self._ws()
            ch = self._peek()
            if ch == "" or ch == "]":
                if ch == "]":
                    self.i += 1
                return arr
            if ch == ",":
                self.i += 1
                continue
            if ch == "}":
                # truncated '[}' — treat as array end, leave '}' for caller
                return arr
            arr.append(self._value())


def repair_json(raw: str) -> str:
    """Parse leniently and re-serialize; returns ``""`` when hopeless
    (mirror of ``json_repair.repair_json`` behavior for the tested corpus)."""
    s = raw.strip()
    if not s:
        return ""
    # fast path: already valid
    try:
        return json.dumps(json.loads(s), ensure_ascii=False)
    except (json.JSONDecodeError, ValueError):
        pass
    # strip Markdown code fences the way LLMs emit them
    if s.startswith("```"):
        s = s.strip("`")
        if s.startswith("json"):
            s = s[4:]
        s = s.strip()
    try:
        value = _LenientParser(s).parse()
    except InvalidJSONError:
        return ""
    if isinstance(value, str):
        # input was not structured at all
        return json.dumps(value, ensure_ascii=False)
    return json.dumps(value, ensure_ascii=False)


def fix_invalid_json(raw_json: str) -> str:
    """Reference ``fix_invalid_json`` (entity_relation_extractor.py:103-111)."""
    repaired = repair_json(raw_json).strip()
    if repaired == '""':
        raise InvalidJSONError("JSON repair resulted in an empty or invalid JSON.")
    if not repaired:
        raise InvalidJSONError("JSON repair resulted in an empty string.")
    return repaired
