"""Rule-driven triple extraction: the declarative JSON-mapping engine.

Faithful reimplementation of the reference's ``RDFModeler#convert``
(/root/reference/lib/rdfmodeler.rb:149-309) over the generic field-record
model (model.py), so the same rule set drives MARC records *and* extracted
web pages.

Semantics preserved (each with a file:line citation into /root/reference):

- mapping tag keys are REGEXES, matched with search against each record tag;
  every matching rule fires (rdfmodeler.rb:155).
- control rules (no ``subfield`` key): whole field value, skipped when blank;
  objects emitted as strict-checked URIs unless datatype == "literal";
  optional ``relation.class`` types the object node (rdfmodeler.rb:160-186).
- data rules: per-subfield; ``conditions`` rewrite the predicate from a
  sibling subfield value (normalized via gsub(/[.\\-]+/,'').downcase, scanned
  against ``orig``, last match wins, ``default`` on miss/empty) or from
  indicator1/indicator2 (rdfmodeler.rb:200-231).
- ``relation`` rules mint an entity URI, type it with ``relation.class`` and
  apply nested relation-subfield rules with the entity as subject
  (rdfmodeler.rb:238-275).  Relation-subfield "uri" objects are coerced to
  URIs even when the strict check fails (RDF::URI(...) wrapping,
  rdfmodeler.rb:268).
- plain rules dispatch datatype uri/integer/float/literal(+lang)
  (rdfmodeler.rb:290-299).
- empty predicates / blank values never emit (rdfmodeler.rb:139,163,245,287).
- duplicate triples are NOT deduplicated here (converter-output semantics;
  dedup happens later on the canonical edge table, SURVEY.md §2.7 O3).

Divergences (documented):

- language tags given as ":no" in mapping JSON are stored as "no" (the
  reference passes the raw string into RDF::Literal).
- urlize options: this engine honors ``no_downcase`` / ``no_convert_spaces``
  / ``regexp`` / ``"urlize": false`` as written in the mapping.  The
  reference's live convert path does NOT forward them (RDFModeler#convert
  passes only ``:downcase`` -- which urlize ignores -- rdfmodeler.rb:165,
  and its has_key? check after delete_if treats ``"urlize": false`` as
  enabled), so the reference always downcases, converts spaces and uses the
  default regexp.  We consider the mapping author's intent authoritative;
  mappings relying on the reference's option-dropping behavior must drop
  the options themselves.  (ADVICE r1.)
"""

from __future__ import annotations

import hashlib
import json
import re
from typing import Any, Optional

from .functions.textops import (
    condition_normalize,
    compile_object_pipeline,
    generate_uri,
    ruby_strip,
    scan_last_match,
)
from .model import Field, Record
from .vocab import DEFAULT_VOCAB, RDF_TYPE, Vocabulary

Triple = tuple[str, str, str, str, Optional[str]]  # subj, pred, obj, kind, lang


_OPTS_CACHE: dict = {}


def _object_opts(spec: dict) -> dict:
    """Lower a rule's ``object`` spec to generate_objects kwargs
    (the option pass-through of rdfmodeler.rb:165,246,263,288).
    Cached per spec identity -- specs are shared rule-set dicts compiled
    once per worker, so the cache is tiny and hit on every record."""
    return _opts_entry(spec)[1]


def _opts_entry(spec: dict) -> tuple:
    key = id(spec)
    hit = _OPTS_CACHE.get(key)
    if hit is not None and hit[0] is spec:
        return hit
    opts = _build_object_opts(spec)
    # a spec with no transform options makes generate_objects the identity
    # ([o]); the hot loop then skips the 13-kwarg call entirely
    trivial = (
        opts["substr_offset"] is None
        and not opts["regex_split"]
        and not opts["regex_substitute"]
        and not opts["combine"]
        and not opts["regex_strip"]
        and not opts["urlize_opt"]
    )
    # compiled per-rule closure: only the steps this rule uses, regexes
    # prebound (functions/textops.py compile_object_pipeline) -- the hot
    # loop calls obj_fn(value, field) instead of the 9-kwarg spec mirror
    obj_fn = None if trivial else compile_object_pipeline(**opts)
    hit = (spec, opts, trivial, obj_fn)
    _OPTS_CACHE[key] = hit
    return hit


def _build_object_opts(spec: dict) -> dict:
    return {
        "regex_split": spec.get("regex_split"),
        "urlize_opt": spec.get("urlize"),
        "no_downcase": bool(spec.get("no_downcase")),
        "no_convert_spaces": bool(spec.get("no_convert_spaces")),
        "urlize_regexp": spec.get("regexp"),
        "regex_strip": spec.get("regex_strip"),
        "regex_substitute": spec.get("regex_substitute"),
        "substr_offset": spec.get("substr_offset"),
        "substr_length": spec.get("substr_length"),
        "combine": spec.get("combine"),
        "combinestring": spec.get("combinestring"),
    }


def _norm_lang(lang: Optional[str]) -> Optional[str]:
    if not lang:
        return None
    return lang[1:] if lang.startswith(":") else lang


class MappingError(ValueError):
    """A rule-set document violates the mapping grammar.  Raised at COMPILE
    time: the reference validates only JSON well-formedness at its API
    surface (mapping.rb:71-78), so a typo'd option silently dropped triples;
    here a malformed mapping fails loudly before any data is touched."""


_OBJECT_SPEC_KEYS = {
    "datatype", "prefix", "lang", "regex_split", "urlize", "no_downcase",
    "no_convert_spaces", "regexp", "regex_strip", "regex_substitute",
    "substr_offset", "substr_length", "combine", "combinestring",
}
_DATATYPES = {"uri", "literal", "integer", "float"}


def _err(path: str, msg: str) -> None:
    raise MappingError(f"mapping{path}: {msg}")


def _validate_object_spec(spec, path: str) -> None:
    if not isinstance(spec, dict):
        _err(path, f"object spec must be a dict, got {type(spec).__name__}")
    unknown = set(spec) - _OBJECT_SPEC_KEYS
    if unknown:
        _err(path, f"unknown object option(s) {sorted(unknown)} "
                   f"(known: {sorted(_OBJECT_SPEC_KEYS)})")
    dt = spec.get("datatype")
    if dt is not None and dt not in _DATATYPES:
        _err(path, f"datatype {dt!r} not one of {sorted(_DATATYPES)}")
    for k in ("substr_offset", "substr_length"):
        if k in spec and not isinstance(spec[k], int):
            _err(path, f"{k} must be an integer")
    if "combine" in spec and not isinstance(spec["combine"], list):
        _err(path, "combine must be a list of subfield codes")
    for k in ("regex_split", "regex_strip", "regexp"):
        if k in spec:
            try:
                re.compile(spec[k])
            except (re.error, TypeError) as e:
                _err(path, f"{k} is not a valid regex: {e}")


def _validate_scan_rule(cv, path: str) -> None:
    if not isinstance(cv, dict):
        _err(path, "condition entry must be a dict")
    if "subs" in cv and not isinstance(cv["subs"], dict):
        _err(path, "subs must be a dict of match -> predicate")
    if "orig" in cv:
        try:
            re.compile(cv["orig"])
        except (re.error, TypeError) as e:
            _err(path, f"orig is not a valid regex: {e}")


def _validate_conditions(cond, path: str) -> None:
    if not isinstance(cond, dict):
        _err(path, "conditions must be a dict")
    keys = set(cond)
    if not keys <= {"subfield", "indicator"}:
        _err(path, f"conditions keys must be 'subfield' or 'indicator', "
                   f"got {sorted(keys)}")
    if "subfield" in cond:
        for ck, cv in cond["subfield"].items():
            _validate_scan_rule(cv, f"{path}.subfield[{ck!r}]")
    if "indicator" in cond:
        ind = cond["indicator"]
        if not isinstance(ind, dict):
            _err(path, "indicator conditions must be a dict")
        for k in set(ind) - {"indicator1", "indicator2", "default"}:
            _err(path, f"unknown indicator key {k!r}")
        for k in ("indicator1", "indicator2"):
            if k in ind:
                _validate_scan_rule(ind[k], f"{path}.indicator.{k}")


def _validate_subfield_rule(sub, path: str) -> None:
    if not isinstance(sub, dict):
        _err(path, "subfield rule must be a dict")
    if "object" in sub:
        _validate_object_spec(sub["object"], f"{path}.object")
    if "conditions" in sub:
        _validate_conditions(sub["conditions"], f"{path}.conditions")
    if "predicate" in sub and not isinstance(sub["predicate"], str):
        _err(path, "predicate must be a string")
    if "relation" in sub:
        rel = sub["relation"]
        if not isinstance(rel, dict) or "class" not in rel:
            _err(f"{path}.relation", "relation requires a 'class'")
        for code2, rs in (rel.get("subfield") or {}).items():
            rp = f"{path}.relation.subfield[{code2!r}]"
            if not isinstance(rs, dict) or "predicate" not in rs or "object" not in rs:
                _err(rp, "relation subfield rules require 'predicate' and 'object'")
            _validate_object_spec(rs["object"], f"{rp}.object")


def validate_mapping(mapping: dict) -> None:
    """Validate a rule-set document against the grammar the engine executes
    (every key the engine reads; unknown object options are errors so typos
    cannot silently drop triples).  Raises MappingError."""
    if not isinstance(mapping, dict):
        raise MappingError(
            f"mapping must be a dict, got {type(mapping).__name__}"
        )
    tags = mapping.get("tags", mapping)
    if not isinstance(tags, dict):
        raise MappingError("mapping['tags'] must be a dict of tag -> rule")
    for key, rule in tags.items():
        path = f".tags[{key!r}]"
        try:
            re.compile(key)
        except re.error as e:
            _err(path, f"tag key is not a valid regex: {e}")
        if not isinstance(rule, dict):
            _err(path, "rule must be a dict")
        if "subfield" in rule:
            if not isinstance(rule["subfield"], dict):
                _err(path, "'subfield' must be a dict of code -> rule")
            for code, sub in rule["subfield"].items():
                _validate_subfield_rule(sub, f"{path}.subfield[{code!r}]")
        else:
            for name, value in rule.items():
                if isinstance(value, dict):
                    if "object" in value:
                        _validate_object_spec(
                            value["object"], f"{path}.{name}.object"
                        )
                    if "relation" in value:
                        rel = value["relation"]
                        if not isinstance(rel, dict) or "class" not in rel:
                            _err(f"{path}.{name}.relation",
                                 "relation requires a 'class'")


def _compile_control(rule: dict, vocab: Vocabulary) -> tuple:
    """Lower a control rule (rdfmodeler.rb:160-186) to emission tuples:
    (pred_uri|None, obj_fn|None, trivial, is_literal, prefix, relcls_uri|None)."""
    entries = []
    for _, value in rule.items():
        if not isinstance(value, dict) or "object" not in value:
            continue
        spec = value["object"]
        _, _, trivial, obj_fn = _opts_entry(spec)
        pred_name = value.get("predicate") or ""
        entries.append(
            (
                vocab.resolve(pred_name) if pred_name else None,
                obj_fn,
                trivial,
                spec.get("datatype") == "literal",
                spec.get("prefix") or "",
                vocab.resolve(value["relation"]["class"])
                if "relation" in value
                else None,
            )
        )
    return tuple(entries)


_DT_CODE = {"uri": 0, "integer": 1, "float": 2}  # anything else: literal=3


def _compile_data(subfield_rules: dict, vocab: Vocabulary) -> tuple:
    """Lower data rules (rdfmodeler.rb:188-304) to emission tuples:
    (code, cond_sub|None, pred_uri|None, relinfo|None, dt_code, lang,
    obj_fn|None, trivial, prefix).  Constant predicates are vocab-resolved HERE
    (once per worker) instead of per field; conditioned predicates keep
    the original sub dict and go through _predicate_name at runtime.
    relinfo = (relcls_uri, ((code2, rpred_uri, is_uri, prefix2, obj_fn2,
    trivial2, lang2), ...))."""
    entries = []
    for code, sub in subfield_rules.items():
        spec = sub.get("object", {})
        _, _, trivial, obj_fn = _opts_entry(spec)
        cond = sub if "conditions" in sub else None
        pred = None
        if cond is None:
            name = sub.get("predicate")
            pred = vocab.resolve(name) if name else None
        relinfo = None
        if "relation" in sub:
            rel_subs = []
            for code2, rs in (sub["relation"].get("subfield") or {}).items():
                rspec = rs["object"]
                _, _, trivial2, obj_fn2 = _opts_entry(rspec)
                rel_subs.append(
                    (
                        code2,
                        vocab.resolve(rs["predicate"]),
                        rspec.get("datatype") == "uri",
                        rspec.get("prefix") or "",
                        obj_fn2,
                        trivial2,
                        _norm_lang(rspec.get("lang")),
                    )
                )
            relinfo = (
                vocab.resolve(sub["relation"]["class"]),
                tuple(rel_subs),
            )
        elif cond is None and pred is None:
            # a plain rule with no predicate can never emit
            # (rdfmodeler.rb:287: empty predicates are dropped) -- the
            # reference still computes objects first; they are pure, so
            # skipping the entry at compile time is observation-identical.
            continue
        entries.append(
            (
                code,
                cond,
                pred,
                relinfo,
                _DT_CODE.get(spec.get("datatype"), 3),
                _norm_lang(spec.get("lang")),
                obj_fn,
                trivial,
                spec.get("prefix") or "",
            )
        )
    return tuple(entries)


class RuleSet:
    """A compiled mapping document ``{"tags": {tag_regex: rule, ...}}``.

    Compiled ONCE per worker (module-level cache / actor __init__) -- the
    reference re-reads db/mappings.json per record (mapping.rb:8-25), which we
    deliberately do not reproduce (SURVEY.md §2.4 T1).  The document is
    schema-validated at construction (validate_mapping; SURVEY.md §2.10).

    Each rule is additionally lowered to an EXECUTION FORM (tuples with
    vocab-resolved predicate/class URIs, pre-normalized lang tags and the
    generate_objects trivial-spec flag) so the per-record hot loop does no
    dict dispatch.  Consequence: an unknown ``PREFIX.name`` anywhere in the
    mapping now raises KeyError at construction instead of on first fire --
    fail-loud at compile, consistent with validate_mapping.
    """

    def __init__(self, mapping: dict, vocab: Vocabulary = DEFAULT_VOCAB):
        validate_mapping(mapping)
        self.mapping = mapping
        self.vocab = vocab
        tags = mapping.get("tags", mapping)  # accept bare tag dict too
        self.compiled: list[tuple[re.Pattern, str, dict, tuple]] = [
            (
                re.compile(key),
                key,
                rule,
                ("c", _compile_control(rule, vocab))
                if "subfield" not in rule
                else ("d", _compile_data(rule["subfield"], vocab)),
            )
            for key, rule in tags.items()
        ]
        blob = json.dumps(mapping, sort_keys=True, ensure_ascii=False).encode()
        self.ruleset_hash = hashlib.sha256(
            blob + vocab.content_hash().encode()
        ).hexdigest()[:16]
        # tag -> matched rules memo: records in one corpus reuse a small set
        # of tag strings (title, link, meta_*, ...), so the per-record regex
        # sweep over every rule collapses to one dict hit per tag.
        self._match_memo: dict[str, tuple] = {}
        self._exec_memo: dict[str, tuple] = {}

    @classmethod
    def from_file(cls, path: str, vocab: Vocabulary = DEFAULT_VOCAB) -> "RuleSet":
        with open(path) as f:
            return cls(json.load(f), vocab)

    def matched_rules(self, tag: str) -> tuple:
        """Rules whose tag-regex matches ``tag`` (memoized)."""
        hit = self._match_memo.get(tag)
        if hit is None:
            hit = tuple(
                rule for pat, _, rule, _x in self.compiled if pat.search(tag)
            )
            self._match_memo[tag] = hit
        return hit

    def matched_exec(self, tag: str) -> tuple:
        """Execution forms of the rules matching ``tag`` (memoized)."""
        hit = self._exec_memo.get(tag)
        if hit is None:
            hit = tuple(
                x for pat, _, _r, x in self.compiled if pat.search(tag)
            )
            self._exec_memo[tag] = hit
        return hit

    def matches(self, tag: str) -> list[dict]:
        return list(self.matched_rules(tag))

    # -- predicate pruning (BGP scan pushdown) ------------------------------
    def _control_entry_preds(self, value: dict) -> set:
        preds = set()
        name = value.get("predicate")
        if name:
            preds.add(self.vocab.resolve(name))
        if "relation" in value:
            preds.add(RDF_TYPE)
        return preds

    def _data_sub_preds(self, sub: dict) -> set:
        names: set = set()
        if "conditions" in sub:
            cond = sub["conditions"]
            sf = cond.get("subfield") or {}
            for cval in sf.values():
                names |= {p for p in (cval.get("subs") or {}).values() if p}
                if cval.get("default"):
                    names.add(cval["default"])
            ind = cond.get("indicator") or {}
            for key in ("indicator1", "indicator2"):
                r = ind.get(key)
                if r:
                    names |= {p for p in (r.get("subs") or {}).values() if p}
            if ind.get("default"):
                names.add(ind["default"])
        elif sub.get("predicate"):
            names.add(sub["predicate"])
        preds = {self.vocab.resolve(n) for n in names}
        if "relation" in sub:
            preds.add(RDF_TYPE)
            for rs in (sub["relation"].get("subfield") or {}).values():
                preds.add(self.vocab.resolve(rs["predicate"]))
        return preds

    def pruned(self, keep_predicates) -> "RuleSet":
        """A RuleSet restricted to rules that can emit any of
        ``keep_predicates`` (full URIs) -- predicate pushdown for BGP /
        SPARQL-shaped consumers that filter the lowered triples by
        predicate anyway (ops/bgp.py prunes non-pattern triples at scan).

        Over-approximate at SUB-RULE granularity: a kept sub-rule emits
        ALL its triples (a relation kept for its type assertion still
        emits its entity link), so output(pruned) [= output(full) and
        every kept-predicate triple survives.  Consumers must still
        filter by predicate; they only stop PAYING for rules whose
        entire emission set is irrelevant.  Conditioned predicates count
        every reachable rewrite (subs values + default)."""
        keep = set(keep_predicates)
        tags = self.mapping.get("tags", self.mapping)
        new_tags = {}
        for key, rule in tags.items():
            if "subfield" in rule:
                kept = {
                    c: s
                    for c, s in rule["subfield"].items()
                    if self._data_sub_preds(s) & keep
                }
                if kept:
                    nr = dict(rule)
                    nr["subfield"] = kept
                    new_tags[key] = nr
            else:
                kept = {
                    k: v
                    for k, v in rule.items()
                    if not (isinstance(v, dict) and "object" in v)
                    or self._control_entry_preds(v) & keep
                }
                if any(
                    isinstance(v, dict) and "object" in v
                    for v in kept.values()
                ):
                    new_tags[key] = kept
        out = {"tags": new_tags} if "tags" in self.mapping else new_tags
        return RuleSet(out, vocab=self.vocab)


class RuleEngine:
    """Record -> triples converter (RDFModeler analog).

    ``resource`` carries the subject-URI template: ``base + prefix +
    record[identifier_tag]`` (rdfmodeler.rb:14-15) and the optional rdf:type
    list (marc2rdf.rb:73 set_type call).
    """

    def __init__(
        self,
        ruleset: RuleSet,
        base: str = "http://example.com/",
        prefix: str = "id_",
        identifier_tag: str = "001",
        resource_type: Optional[str] = None,
    ):
        self.ruleset = ruleset
        self.vocab = ruleset.vocab
        self.base = base
        self.prefix = prefix
        self.identifier_tag = identifier_tag
        self.resource_type = resource_type

    # -- subject minting ---------------------------------------------------
    def subject_uri(self, record: Record) -> Optional[str]:
        ident = record.first_value(self.identifier_tag)
        if ident is None:
            return None
        return f"{self.base}{self.prefix}{ident}"

    # -- type statements (rdfmodeler.rb:28-33) -----------------------------
    def set_type(self, subj: str, types: Any) -> list[Triple]:
        if not isinstance(types, list):
            types = str(types).replace(" ", "").split(",")
        return [
            (subj, RDF_TYPE, self.vocab.resolve(t), "uri", None) for t in types if t
        ]

    # -- conversion --------------------------------------------------------
    def convert(self, record: Record, include_types: bool = True) -> list[Triple]:
        subj = self.subject_uri(record)
        if subj is None:
            return []
        out: list[Triple] = []
        if include_types and self.resource_type:
            out.extend(self.set_type(subj, self.resource_type))
        # one pass to group fields by tag (first-appearance order), then the
        # memoized tag->exec lookup -- no per-record regex sweep, no dict
        # dispatch (predicates/classes resolved at RuleSet compile).
        by_tag: dict[str, list[Field]] = {}
        for f in record.fields:
            by_tag.setdefault(f.tag, []).append(f)
        matched_exec = self.ruleset.matched_exec
        run_control = self._run_control
        run_data = self._run_data
        for tag, fields in by_tag.items():
            for kind, entries in matched_exec(tag):
                if kind == "c":
                    for fld in fields:
                        run_control(out, subj, fld, entries)
                else:
                    for fld in fields:
                        run_data(out, subj, fld, entries)
        return out

    # control rules: rdfmodeler.rb:160-186 (compiled form)
    def _run_control(
        self, out: list[Triple], subj: str, fld: Field, entries: tuple
    ) -> None:
        marc_object = fld.value or ""
        if not ruby_strip(marc_object):
            return
        for pred, obj_fn, trivial, is_literal, prefix, relcls in entries:
            objects = (
                (marc_object,) if trivial else obj_fn(marc_object, fld)
            )
            for o in objects:
                if o is None or not ruby_strip(o):
                    continue
                if not is_literal:
                    val, kind = generate_uri(o, prefix)
                    if pred is not None:
                        out.append((subj, pred, val, kind, None))
                    if relcls is not None:
                        out.append((val, RDF_TYPE, relcls, "uri", None))
                elif pred is not None:
                    out.append((subj, pred, o, "literal", None))

    # predicate from conditions: rdfmodeler.rb:200-234
    def _predicate_name(self, fld: Field, sub: dict) -> Optional[str]:
        if "conditions" not in sub:
            return sub.get("predicate")
        cond = sub["conditions"]
        pred: Optional[str] = ""
        if "subfield" in cond:
            for ckey, cval in cond["subfield"].items():
                m = fld.first(ckey) or ""
                if m:
                    norm = condition_normalize(m)
                    last = scan_last_match(cval.get("orig", ""), norm)
                    if last is not None:
                        pred = cval.get("subs", {}).get(last)
                    if not pred:
                        pred = cval.get("default")
                else:
                    pred = cval.get("default")
        elif "indicator" in cond:
            ind = cond["indicator"]
            for ind_key, ind_val in (("indicator1", fld.ind1), ("indicator2", fld.ind2)):
                ind_rule = ind.get(ind_key)
                if ind_rule:
                    last = scan_last_match(ind_rule.get("orig", ""), ind_val or "")
                    if last is not None:
                        pred = ind_rule.get("subs", {}).get(last)
            if not pred:
                pred = ind.get("default")
        return pred

    # data rules: rdfmodeler.rb:188-304 (compiled form)
    def _run_data(
        self, out: list[Triple], subj: str, fld: Field, entries: tuple
    ) -> None:
        first = fld.first
        resolve = self.vocab.resolve
        for code, cond, pred, relinfo, dt, lang, obj_fn, trivial, prefix in entries:
            if cond is not None:
                name = self._predicate_name(fld, cond)
                pred = resolve(name) if name else None
                if pred is None and relinfo is None:
                    continue
            marc_object = first(code)
            if not marc_object:
                continue
            objects = (
                (marc_object,) if trivial else obj_fn(marc_object, fld)
            )
            if relinfo is not None:
                relcls, rel_subs = relinfo
                for o in objects:
                    if o is None:
                        continue
                    val, kind = generate_uri(o, prefix)
                    if pred is not None:
                        out.append((subj, pred, val, kind, None))
                    out.append((val, RDF_TYPE, relcls, "uri", None))
                    for (code2, rpred, is_uri, prefix2, obj_fn2, trivial2,
                         lang2) in rel_subs:
                        relobject = first(code2)
                        if not relobject:
                            continue
                        relobjects = (
                            (relobject,)
                            if trivial2
                            else obj_fn2(relobject, fld)
                        )
                        for ro in relobjects:
                            if ro is None:
                                continue
                            if is_uri:
                                rval, _ = generate_uri(ro, prefix2)
                                # RDF::URI(...) coercion: always a URI here
                                out.append((val, rpred, rval, "uri", None))
                            else:
                                out.append((val, rpred, ro, "literal", lang2))
            elif dt == 0:  # uri
                for o in objects:
                    if o is None:
                        continue
                    val, kind = generate_uri(o, prefix)
                    out.append((subj, pred, val, kind, None))
            elif dt == 3:  # literal
                for o in objects:
                    if o is None:
                        continue
                    out.append((subj, pred, o, "literal", lang))
            else:
                k = "integer" if dt == 1 else "float"
                for o in objects:
                    if o is None:
                        continue
                    out.append((subj, pred, o, k, None))
