"""Mass value-verification sweep over the reference's clientpositive
golden corpus.

For every `.q` file NOT already replayed by a tests/test_qfile_* module,
extract the SELECT statements whose table surface is the standard
src/src1/srcpart fixtures PLUS any fixture-chain tables the file itself
builds (CTAS, CREATE TABLE + INSERT/VALUES, FROM-first multi-inserts,
CREATE VIEW, CREATE TEMPORARY FUNCTION over builtin/test-jar classes —
executed in file order on BOTH engines, dropped per file), run each
through BOTH this engine and DuckDB, and compare with the same
canonicalization the driver's correctness gate uses (column-name-
sorted, order-insensitive, float-normalized). Prelude statements that
are nondeterministic (rand, LIMIT without total order, TABLESAMPLE) or
mutate a fixture in unreplayed ways (LOAD DATA, ALTER) poison their
targets — later selects over them are counted prelude_skip, never
compared against divergent fixtures.

Statements are skipped (not failed) when:
- DuckDB itself cannot run the raw HiveQL (its coercion rules differ —
  e.g. '' cast to int errors where Hive yields NULL); the value check
  needs a hand-written oracle, which is what the curated test modules
  are for;
- the statement has a LIMIT/TABLESAMPLE without a total ORDER BY (the
  row subset is legitimately nondeterministic);
- the statement is nondeterministic by construction (rand, uuid,
  current_*, INPUT__FILE__NAME).

Output: one JSON line per disposition bucket plus a mismatch report —
a mismatch here is a REAL candidate value bug worth a curated test.

    python tools/qfile_value_sweep.py --out QFILE_SWEEP.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Hermetic scratch per sweep run (r13): the sweep's preludes LOAD DATA
# and INSERT into managed tables under the scratch warehouse; with the
# shared default scratch, a SECOND sweep run inherits the first run's
# table contents (dynamic-partition INSERTs append) and a handful of
# encryption-family statements flip from match to fixture_skip. Must
# precede the session import (scratch base is computed at import time).
if "SPARK_GRAFT_SCRATCH" not in os.environ:
    os.environ["SPARK_GRAFT_SCRATCH"] = tempfile.mkdtemp(
        prefix="hive232_qfile_sweep_"
    )

from hive_2_3_2_spark.hiveql_rewrites import (  # noqa: E402
    _rewrite_groupby_ordinal_constants,
)

QDIR = "/root/reference/ql/src/test/queries/clientpositive"

_NONDET = re.compile(
    r"\b(rand|uuid|current_date|current_timestamp|current_user|"
    r"input__file__name|unix_timestamp\s*\(\s*\))\b",
    re.IGNORECASE,
)
_LIMITED = re.compile(r"\b(limit\s+\d+|tablesample)\b", re.IGNORECASE)
_TOTAL_ORDER = re.compile(r"\border\s+by\b", re.IGNORECASE)


def covered_files() -> set[str]:
    names = set()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in glob.glob(os.path.join(here, "tests", "test_qfile_*.py")):
        for m in re.finditer(r"([a-z0-9_]+)\.q\b", open(p).read()):
            names.add(m.group(1))
    return names


ALLOWED_TABLES = {"src", "src1", "srcpart", "alltypesorc", "over10k",
                  "cbo_t1", "cbo_t2", "cbo_t3", "part"}

_CTAS_PRELUDE = re.compile(
    r"^create\s+table\s+`?(\w+)`?\s+(?:stored\s+as\s+\w+\s+)?as\s+select\b",
    re.IGNORECASE,
)
_CREATE_TBL_PRELUDE = re.compile(
    r"^create\s+table\s+`?(\w+)`?\s*\(", re.IGNORECASE
)
_INSERT_PRELUDE = re.compile(
    r"^insert\s+(?:into|overwrite)\s+table\s+`?(\w+)`?", re.IGNORECASE
)
_DROP_PRELUDE = re.compile(
    r"^drop\s+table\s+(?:if\s+exists\s+)?`?(\w+)`?\s*$", re.IGNORECASE
)
_CREATE_VIEW_PRELUDE = re.compile(
    r"^create\s+view\s+(?:if\s+not\s+exists\s+)?`?(\w+)`?\s+as\s+select\b",
    re.IGNORECASE,
)
_DROP_VIEW_PRELUDE = re.compile(
    r"^drop\s+view\s+(?:if\s+exists\s+)?`?(\w+)`?\s*$", re.IGNORECASE
)
#: statement heads that can MUTATE a table's contents/layout — any of
#: these touching a created table poisons it (the replay doesn't model
#: them); read-only heads (create view, explain, select...) never do
_MUTATING_HEADS = ("load", "alter", "truncate", "msck", "import",
                   "touch", "update", "delete", "merge")

_FN_PRELUDE = re.compile(
    r"^create\s+temporary\s+function\s+\w+\s+as\s+'([^']+)'\s*$",
    re.IGNORECASE,
)
_DROP_FN_PRELUDE = re.compile(
    r"^drop\s+temporary\s+function\s+(?:if\s+exists\s+)?(\w+)\s*$",
    re.IGNORECASE,
)
#: AS-strings the engine's CREATE TEMPORARY FUNCTION accepts without a
#: JVM: its test-jar map plus Hive builtin classes (engine resolves
#: those to Spark builtins itself)
_FN_CLASS_OK = re.compile(
    r"^(?:org\.apache\.hadoop\.hive\.(?:ql\.udf|contrib)\.|"
    r"hive\.it\.custom\.udfs\.)"
)


def _stmt_tables(s: str) -> set[str]:
    return {
        t.lower()
        for t in re.findall(
            r"\b(?:from|join)\s+`?(\w+)`?", s, re.IGNORECASE
        )
    }


def extract_statements() -> list[tuple[str, str]]:
    """Flat (file, select) pairs for files with no usable preludes —
    kept for the simple path; prelude-bearing files come from
    extract_file_records()."""
    return [
        (rec["file"], s)
        for rec in extract_file_records()
        if not rec["preludes_used"]
        for kind, s in rec["stmts"]
        if kind == "select"
    ]


def extract_file_records() -> list[dict]:
    recs = []
    covered = covered_files()
    for qf in sorted(glob.glob(f"{QDIR}/*.q")):
        name = os.path.basename(qf)[:-2]
        if name in covered:
            continue
        raw = open(qf, errors="replace").read()
        # strip -- comments OUTSIDE string literals only (a '---'
        # literal argument must survive: udf_from_utc_timestamp.q)
        lines = []
        for ln in raw.split("\n"):
            in_q = None
            for i, ch in enumerate(ln):
                if in_q:
                    if ch == in_q:
                        in_q = None
                elif ch in "'\"":
                    in_q = ch
                elif ch == "-" and ln[i: i + 2] == "--":
                    ln = ln[:i]
                    break
            lines.append(ln)
        txt = "\n".join(lines)
        # split on ; outside quotes
        parts, buf, q = [], [], None
        for ch in txt:
            if q:
                if ch == q:
                    q = None
                buf.append(ch)
            elif ch in "'\"":
                q = ch
                buf.append(ch)
            elif ch == ";":
                parts.append("".join(buf))
                buf = []
            else:
                buf.append(ch)
        parts.append("".join(buf))
        created: set[str] = set()
        ever_created: set[str] = set()
        poisoned: set[str] = set()
        fn_names: set[str] = set()
        stmts: list[tuple[str, str]] = []
        for raw in parts:
            s = raw.strip()
            if not s:
                continue
            if not re.match(r"^select\b", s, re.IGNORECASE):
                # ---- prelude candidates (fixture chains) ----
                cm = _CTAS_PRELUDE.match(s) or _CREATE_TBL_PRELUDE.match(s)
                if cm:
                    t = cm.group(1).lower()
                    if t in ALLOWED_TABLES:
                        continue
                    srcs = _stmt_tables(s) - {t}
                    nondet = _NONDET.search(s) or (
                        _LIMITED.search(s) and not _TOTAL_ORDER.search(s)
                    )
                    if (srcs - ALLOWED_TABLES - created or t in poisoned
                            or nondet):
                        # nondeterministic fixture bodies (rand, LIMIT
                        # without a total order) would make the two
                        # engines' derived tables legitimately differ
                        poisoned.add(t)
                    else:
                        created.add(t)
                        ever_created.add(t)
                        stmts.append(("exec", s))
                    continue
                im = _INSERT_PRELUDE.match(s)
                if im:
                    t = im.group(1).lower()
                    if (t in created
                            and not (_stmt_tables(s) - ALLOWED_TABLES
                                     - created - {t})
                            and not _NONDET.search(s)
                            and not (_LIMITED.search(s)
                                     and not _TOTAL_ORDER.search(s))):
                        stmts.append(("exec", s))
                    elif t in created:
                        poisoned.add(t)
                        created.discard(t)
                    continue
                if re.match(r"(?is)^\s*from\b", s) and re.search(
                    r"\binsert\s+(?:into|overwrite)\s+table\b", s,
                    re.IGNORECASE,
                ):
                    # Hive's FROM-first (multi-)insert — the engine
                    # runs it natively; duck_exec_statements splits it
                    # into one INSERT ... SELECT per sink
                    targets = {
                        t.lower() for t in re.findall(
                            r"insert\s+(?:into|overwrite)\s+table\s+"
                            r"`?(\w+)`?", s, re.IGNORECASE,
                        )
                    }
                    nondet = _NONDET.search(s) or (
                        _LIMITED.search(s)
                        and not _TOTAL_ORDER.search(s)
                    )
                    srcs = _stmt_tables(s) - targets
                    if (targets <= created
                            and not (srcs - ALLOWED_TABLES - created)
                            and not nondet):
                        stmts.append(("exec", s))
                    else:
                        poisoned |= targets & created
                        created -= targets
                    continue
                dm = _DROP_PRELUDE.match(s) or _DROP_VIEW_PRELUDE.match(s)
                if dm:
                    t = dm.group(1).lower()
                    if t in created:
                        stmts.append(("exec", s))
                        # a later re-create is a fresh relation; a
                        # second DROP (or an unreplayed recreate's
                        # drop) must not error the replay
                        created.discard(t)
                    continue
                vm = _CREATE_VIEW_PRELUDE.match(s)
                if vm:
                    t = vm.group(1).lower()
                    if t in ALLOWED_TABLES:
                        continue
                    srcs = _stmt_tables(s) - {t}
                    nondet = _NONDET.search(s) or (
                        _LIMITED.search(s) and not _TOTAL_ORDER.search(s)
                    )
                    if (srcs - ALLOWED_TABLES - created or t in poisoned
                            or nondet):
                        poisoned.add(t)
                    else:
                        created.add(t)
                        ever_created.add(t)
                        stmts.append(("exec", s))
                    continue
                fm = _FN_PRELUDE.match(s)
                if fm and _FN_CLASS_OK.match(fm.group(1)):
                    fn_names.add(
                        re.match(
                            r"^create\s+temporary\s+function\s+(\w+)",
                            s, re.IGNORECASE,
                        ).group(1).lower()
                    )
                    stmts.append(("exec", s))
                    continue
                if re.match(
                    r"(?is)^set\s+(?:hive\.support\.quoted\."
                    r"identifiers|hive\.groupby\.orderby\.position\."
                    r"alias)\s*=",
                    s,
                ):
                    # parse-semantics switches the engine honors: the
                    # regex-column mode (ambiguous_col.q) and the
                    # group-by position alias (groupby_position.q) —
                    # replayed, and reset at file end
                    stmts.append(("exec", s))
                    continue
                mcm = re.match(
                    r"(?is)^create\s+temporary\s+macro\s+(\w+)", s
                )
                if mcm:
                    # macros are engine session state (macro_1.q);
                    # the duck side sees macro CALLS pre-expanded via
                    # eng._expand_macros in the select loop
                    fn_names.add(mcm.group(1).lower())
                    stmts.append(("exec", s))
                    continue
                dmm = re.match(
                    r"(?is)^drop\s+temporary\s+macro\s+"
                    r"(?:if\s+exists\s+)?(\w+)",
                    s,
                )
                if dmm:
                    if dmm.group(1).lower() in fn_names:
                        stmts.append(("exec", s))
                    continue
                dfm = _DROP_FN_PRELUDE.match(s)
                if dfm:
                    # only replay drops of functions THIS file
                    # registered (a file often drops defensively first)
                    if dfm.group(1).lower() in fn_names:
                        stmts.append(("exec", s))
                    continue
                am_ = re.match(r"(?is)^add\s+file\s+(\S+)\s*$", s)
                if am_:
                    # TRANSFORM scripts: the reference's are python-2;
                    # replay ADD FILE against the python-3 port in
                    # tools/sweep_scripts/ when one exists (same
                    # stdout), else drop (the select stays spark_err)
                    base = os.path.basename(am_.group(1))
                    port = os.path.join(
                        os.path.dirname(os.path.abspath(__file__)),
                        "sweep_scripts", base,
                    )
                    if os.path.exists(port):
                        stmts.append(("exec", f"add file {port}"))
                    continue
                # a MUTATING statement touching a created table changes
                # it in a way the prelude replay doesn't model —
                # poison it (its later selects get skipped); read-only
                # statements (explain/show/create view over it) don't
                low_head = s.split(None, 1)[0].lower()
                if low_head in _MUTATING_HEADS:
                    touched = {
                        t for t in created
                        if re.search(rf"\b{t}\b", s, re.IGNORECASE)
                    }
                    poisoned |= touched
                    created -= touched
                continue
            tbls = _stmt_tables(s)
            if tbls - ALLOWED_TABLES - created:
                continue
            if len(s) > 3000 or _NONDET.search(s):
                continue
            if _LIMITED.search(s) and not _TOTAL_ORDER.search(s):
                continue
            if re.search(
                r"\b(first_value|last_value|lead|lag|row_number|ntile)"
                r"\s*\(", s, re.IGNORECASE,
            ):
                # order-sensitive window values are nondeterministic
                # when the window ORDER BY has ties — the curated test
                # modules pin them under total orders instead
                continue
            if re.search(
                r"\b(?:min|max)\s*\(", s, re.IGNORECASE,
            ) and re.search(
                r"\b(?:named_)?struct\s*\(", s, re.IGNORECASE,
            ) and re.search(r"\bnull\b", s, re.IGNORECASE):
                # min/max over structs with NULL fields: DuckDB's
                # struct comparator sorts NULL fields LAST where
                # Hive/Spark sort them FIRST (ObjectInspectorUtils
                # nulls-first) — an oracle artifact, not a value bug
                # (min_structvalue.q; adjudicated r9)
                continue
            # hash() statements COMPARE from r12 on: the engine
            # rewrites them (stars included, via _expand_hash_star) to
            # Hive's getBucketHashCode semantics and the duck side
            # runs the identical fold; a call the typed rewrite can't
            # resolve is skipped at RUN time (hash_native_skip).
            if re.search(r"\bover\s*\(", s, re.IGNORECASE) and \
                    "select *" in s.lower():
                # select *, fn() over (...): the unaliased window column
                # NAME differs between engines and the comparator keys
                # columns by name — a naming artifact, not a value issue
                continue
            stmts.append(("select", s))
        # preludes only pay for themselves when some kept select needs
        # a created table or a registered function — otherwise drop
        # them (the classic no-side-effect path)
        ever_created |= created | poisoned
        # replayed SET statements change parse semantics for the whole
        # file — keep them whenever present
        needed = any(
            k == "exec" and s.lower().lstrip().startswith("set ")
            for k, s in stmts
        )
        script_bases = [
            os.path.basename(s.split()[-1])
            for k, s in stmts
            if k == "exec" and s.lower().startswith("add file")
        ]
        for kind, s in stmts:
            if kind != "select":
                continue
            if _stmt_tables(s) & ever_created:
                needed = True
                break
            if fn_names and any(
                re.search(rf"\b{fn}\s*\(", s, re.IGNORECASE)
                for fn in fn_names
            ):
                needed = True
                break
            if any(base in s for base in script_bases):
                needed = True
                break
        if not needed:
            stmts = [(k, s) for k, s in stmts if k == "select"]
        if stmts:
            recs.append({
                "file": name,
                "stmts": stmts,
                # cleanup list: dropped/poisoned tables may half-exist
                "created": sorted(ever_created),
                "preludes_used": needed,
            })
    return recs


_IDENT = r"[a-zA-Z_][\w.]*"


def _split_top_args(argstr: str) -> list[str]:
    """Split a call's argument text at top-level commas (quote- and
    paren-aware)."""
    args: list[str] = []
    buf: list[str] = []
    depth = 0
    q = None
    for ch in argstr:
        if q:
            if ch == q:
                q = None
            buf.append(ch)
        elif ch in "'\"":
            q = ch
            buf.append(ch)
        elif ch in "([{":
            depth += 1
            buf.append(ch)
        elif ch in ")]}":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            args.append("".join(buf).strip())
            buf = []
        else:
            buf.append(ch)
    tail = "".join(buf).strip()
    if tail or args:
        args.append(tail)
    return args


def _rewrite_calls(s: str, name: str, repl_fn) -> str:
    """Replace every balanced `name(...)` call via repl_fn(args) —
    repl_fn returns the replacement text or None to leave the call."""
    pat = re.compile(rf"\b{name}\s*\(", re.IGNORECASE)
    i = 0
    while True:
        m = pat.search(s, i)
        if not m:
            return s
        depth, j, q = 1, m.end(), None
        while j < len(s) and depth:
            ch = s[j]
            if q:
                if ch == q:
                    q = None
            elif ch in "'\"":
                q = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            j += 1
        if depth:
            return s
        repl = repl_fn(_split_top_args(s[m.end(): j - 1]))
        if repl is None:
            i = m.end()
            continue
        s = s[: m.start()] + repl + s[j:]
        i = m.start() + len(repl)


#: deterministic-stdout TRANSFORM scripts → DuckDB relation modeling
#: their exact output (reference: data/scripts/<name>; the python-3
#: ports the engine side runs live in tools/sweep_scripts/)
_SCRIPT_ORACLES = {
    # dumpdata_script.py ignores stdin and prints 20000*i + k for
    # i<50, j<5, k<20022 (each value 5x; multiplicity irrelevant under
    # the count(distinct) the only golden runs over it)
    "dumpdata_script.py": (
        "(SELECT CAST((20000 * a.range) + b.range AS VARCHAR) AS key "
        "FROM range(50) a CROSS JOIN range(20022) b)"
    ),
}


#: Hive SimpleDateFormat → strftime pattern pieces (common subset)
_HFMT = (("yyyy", "%Y"), ("yy", "%y"), ("MM", "%m"), ("dd", "%d"),
         ("HH", "%H"), ("mm", "%M"), ("ss", "%S"))


def _sub_nonliteral(pattern, repl, s: str, flags: int = 0) -> str:
    """re.sub applied ONLY outside quoted string literals — operand-
    shaped text inside a literal ("value2-1") must never rewrite."""
    out: list[str] = []
    i = 0
    for m in re.finditer(r"'(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\"", s):
        out.append(re.sub(pattern, repl, s[i:m.start()], flags=flags))
        out.append(m.group(0))
        i = m.end()
    out.append(re.sub(pattern, repl, s[i:], flags=flags))
    return "".join(out)


def _rewrite_cat_transforms(s: str) -> str:
    """``TRANSFORM(exprs) USING 'cat' [AS (names)|AS n1, n2]`` → a
    cast projection (the identity script serializes each expression to
    its string form). With no AS clause the output schema is Hive's
    default ``(key, value)``: key = first field, value = the remaining
    fields tab-joined."""
    pat = re.compile(r"(?is)\btransform\s*\(")
    out: list[str] = []
    while True:
        m = pat.search(s)
        if m is None:
            break
        open_idx = s.index("(", m.start())
        depth, i, q = 1, open_idx + 1, None
        while i < len(s) and depth:
            ch = s[i]
            if q:
                if ch == q:
                    q = None
            elif ch in "'\"":
                q = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            i += 1
        close = i - 1
        args = [
            a.strip() for a in _split_top_args(s[open_idx + 1:close])
        ]
        # expand `t.*` through the declared column order when known
        # (mapreduce7.q's MAP src.*, ...); a bare/unknown star bails
        expanded: list[str] = []
        star_ok = True
        for a in args:
            sm = re.fullmatch(r"(\w+)\.\*", a)
            if sm and sm.group(1).lower() in _DUCK_TABLE_COLS:
                expanded.extend(
                    f"{sm.group(1)}.`{c}`"
                    if c in ("key", "value") else f"{sm.group(1)}.{c}"
                    for c in _DUCK_TABLE_COLS[sm.group(1).lower()][0]
                )
            elif "*" in a:
                star_ok = False
                break
            else:
                expanded.append(a)
        args = expanded if star_ok else ["*"]
        rest = s[close + 1:]
        # optional ROW FORMAT DELIMITED on the INPUT side (input35.q
        # uses '\002') — with the identity script and matching in/out
        # delimiters the sep only matters for the no-AS value join
        rowfmt = re.compile(
            r"(?is)^\s*ROW\s+FORMAT\s+DELIMITED\s+FIELDS\s+"
            r"TERMINATED\s+BY\s+'((?:[^'\\]|\\.)*)'\s*"
        )
        sep_ord = 9
        eaten = 0
        fm_ = rowfmt.match(rest)
        if fm_:
            raw = fm_.group(1)
            om_ = re.fullmatch(r"\\(\d{1,3})", raw)
            sep_ord = (
                int(om_.group(1), 8) if om_
                else 9 if raw in ("\\t", "\t") else ord(raw[:1] or "\t")
            )
            eaten = fm_.end()
            rest = rest[eaten:]
        um = re.match(r"(?is)^\s*using\s+'(?:\S*/)?cat'\s*", rest)
        proj = consumed = None
        # literal args with embedded tab/newline escapes (newline.q)
        # round-trip through the script's FIELD separators — the cast
        # projection can't model that split; keep their duck_err
        args_ok = args and "*" not in args and not any(
            re.search(r"\\[tnr]|\t", a) for a in args
        )
        if um is not None and args_ok:
            rest2 = rest[um.end():]
            am = re.match(
                r"(?is)^as\s*\(([^()]*)\)"
                r"|^as\s+([a-z_]\w*(?:\s*,\s*[a-z_]\w*)*)",
                rest2,
            )
            casts = [f"CAST({a} AS VARCHAR)" for a in args]
            if am:
                names = [
                    n.strip().split()[0]
                    for n in _split_top_args(am.group(1) or am.group(2))
                ]
                if len(names) == len(args):
                    consumed = close + 1 + eaten + um.end() + am.end()
                    # optional OUTPUT-side ROW FORMAT after the AS
                    tm_ = rowfmt.match(rest2[am.end():])
                    out_ord = sep_ord if not fm_ else 9
                    if tm_:
                        raw2 = tm_.group(1)
                        om2 = re.fullmatch(r"\\(\d{1,3})", raw2)
                        out_ord = (
                            int(om2.group(1), 8) if om2
                            else 9 if raw2 in ("\\t", "\t")
                            else ord(raw2[:1] or "\t")
                        )
                        consumed += tm_.end()
                    if out_ord != sep_ord:
                        # MISMATCHED in/out delimiters (input36.q's
                        # \002 in, \003 out): the echoed line carries
                        # no out-sep, so the FIRST output column takes
                        # the whole line and the rest read NULL
                        first = (
                            f"concat_ws(chr({sep_ord}), "
                            + ", ".join(casts) + ")"
                            if len(casts) > 1 else casts[0]
                        )
                        proj = ", ".join(
                            [f"{first} AS `{names[0]}`"]
                            + [
                                f"CAST(NULL AS VARCHAR) AS `{n}`"
                                for n in names[1:]
                            ]
                        )
                    else:
                        proj = ", ".join(
                            f"{c} AS `{n}`"
                            for c, n in zip(casts, names)
                        )
            else:
                val = (
                    casts[1] if len(casts) == 2
                    else f"concat_ws(chr({sep_ord}), "
                    + ", ".join(casts[1:])
                    + ")" if len(casts) > 2 else "NULL"
                )
                proj = f"{casts[0]} AS `key`, {val} AS `value`"
                consumed = close + 1 + eaten + um.end()
        if proj is None:
            out.append(s[:close + 1])
            s = s[close + 1:]
            continue
        out.append(s[:m.start()] + proj + " ")
        s = s[consumed:]
    out.append(s)
    return "".join(out)


def duck_translate(s: str) -> str:
    """Best-effort HiveQL → DuckDB oracle translation for the retry
    pass: Hive's permissive coercions spelled explicitly, plus the
    dialect spellings DuckDB doesn't share. Applied ONLY when the raw
    statement already failed in DuckDB — a bad translation can only
    turn a skip into a skip or a (reviewed) mismatch, never corrupt a
    raw-match."""
    # deterministic TRANSFORM scripts model as SQL: the harness ships a
    # python-3 port of the reference script to the engine (ADD FILE),
    # and the oracle side replaces the transform subquery with a
    # relation producing the script's exact stdout (the script ignores
    # stdin, so its output is a closed form)
    for script, oracle_rel in _SCRIPT_ORACLES.items():
        if script in s:
            s = re.sub(
                rf"\(\s*FROM\s+\w+\s+(?:MAP|REDUCE|SELECT\s+TRANSFORM)"
                rf"[^()]*'[^']*{re.escape(script)}'[^()]*\)",
                oracle_rel, s, flags=re.IGNORECASE,
            )
    # ---- translation batch 4 (r11) ----
    # typed numeric literal suffixes: 1L bigint, 2S smallint, 3Y
    # tinyint, 1.5BD decimal — DuckDB has no suffix literals
    s = _sub_nonliteral(
        r"(?<![\w.])(\d+(?:\.\d+)?)BD\b", r"\1", s, re.IGNORECASE
    )
    s = _sub_nonliteral(r"(?<![\w.])(\d+)L\b", r"CAST(\1 AS BIGINT)", s)
    s = _sub_nonliteral(
        r"(?<![\w.])(\d+)S\b", r"CAST(\1 AS SMALLINT)", s
    )
    s = _sub_nonliteral(r"(?<![\w.])(\d+)Y\b", r"CAST(\1 AS TINYINT)", s)
    # D/F float-literal suffixes (1.5D double, 2.5F float)
    s = _sub_nonliteral(
        r"(?<![\w.])(\d+\.\d+)D\b", r"CAST(\1 AS DOUBLE)", s,
        re.IGNORECASE,
    )
    s = _sub_nonliteral(
        r"(?<![\w.])(\d+\.\d+)F\b", r"CAST(\1 AS FLOAT)", s,
        re.IGNORECASE,
    )
    # identity transform: TRANSFORM(exprs) USING 'cat' = a cast
    # projection (tab-delimited round trip is lossless — 'cat' echoes
    # the serialized fields; literal args with embedded tabs —
    # newline.q — keep their duck_err, that escaping is exactly what
    # those goldens test). Balanced-paren scan so expression args
    # (CAST(key/10 AS INT), mapreduce3.q) work; WITHOUT an AS clause
    # Hive types the output (key, value) with value = remaining fields
    # tab-joined (SemanticAnalyzer genScriptPlan's default schema —
    # input18.q's regexp_replace(tmap.value,'\t','+') reads it).
    s = _rewrite_cat_transforms(s)
    # implicit alias after a numeric literal (SELECT 11 key, ...)
    s = _sub_nonliteral(
        r"(?i)((?:\bselect|,)\s*)(\d+(?:\.\d+)?)\s+([a-z_]\w*)"
        r"(?=\s*,|\s+from\b|\s*\))",
        r"\1\2 AS \3", s,
    )
    # Hive's cast-function spelling int(x)
    s = _rewrite_calls(
        s, "int",
        lambda a: f"CAST({a[0]} AS INTEGER)" if len(a) == 1 else None,
    )
    # struct(...) IN (struct(...), ...) — duck's struct_pack literals
    # would mismatch on field names; row() tuples compare natively
    if re.search(
        r"(?is)struct\s*\((?:[^()]|\([^()]*\))*\)\s+in\s*\(", s
    ):
        s = re.sub(r"(?is)\bstruct\s*\(", "row(", s)
    # MINUS is Hive's EXCEPT [DISTINCT]
    s = _sub_nonliteral(r"(?i)\bminus\b", "EXCEPT", s)
    # isnull/isnotnull predicates
    s = _rewrite_calls(
        s, "isnull",
        lambda a: f"(({a[0]}) IS NULL)" if len(a) == 1 else None,
    )
    s = _rewrite_calls(
        s, "isnotnull",
        lambda a: f"(({a[0]}) IS NOT NULL)" if len(a) == 1 else None,
    )
    # date-part functions over strings (duck needs a DATE/TIMESTAMP
    # operand; Hive accepts the string form — columns too, e.g.
    # day(srcpart.ds) in dynamic_partition_pruning.q). TRY_CAST is a
    # no-op for already-typed operands and Hive-NULLs junk strings.
    for dp in ("day", "dayofmonth", "month", "year", "hour", "minute",
               "second", "quarter", "weekofyear"):
        s = _rewrite_calls(
            s, dp,
            (lambda name: lambda a: (
                None if len(a) != 1
                or "TRY_CAST" in a[0].upper() else
                ("day" if name == "dayofmonth"
                 else "week" if name == "weekofyear" else name)
                + f"(TRY_CAST({a[0]} AS TIMESTAMP))"
            ))(dp),
        )
    # to_date(x) / Hive's date(x) spelling
    s = _rewrite_calls(
        s, "to_date",
        lambda a: (
            f"CAST(TRY_CAST({a[0]} AS TIMESTAMP) AS DATE)"
            if len(a) == 1 else None
        ),
    )
    s = _rewrite_calls(
        s, "date",
        lambda a: (
            f"TRY_CAST({a[0]} AS DATE)" if len(a) == 1 else None
        ),
    )
    # unix_timestamp(x[, fmt]) → epoch seconds

    def _unix_ts(a):
        if len(a) == 1:
            return f"epoch(TRY_CAST({a[0]} AS TIMESTAMP))"
        if len(a) == 2:
            fm = re.fullmatch(r"\s*'([^']*)'\s*", a[1])
            if not fm:
                return None
            fmt = fm.group(1)
            for h, dd in _HFMT:
                fmt = fmt.replace(h, dd)
            if "%" not in fmt:
                return None
            return f"epoch(strptime({a[0]}, '{fmt}'))"
        return None

    s = _rewrite_calls(s, "unix_timestamp", _unix_ts)
    s = _rewrite_calls(s, "to_unix_timestamp", _unix_ts)
    # binary(x) → the string's utf8 bytes ARE what Hive hashes/decodes
    s = _rewrite_calls(
        s, "binary", lambda a: a[0] if len(a) == 1 else None
    )
    s = _rewrite_calls(
        s, "decode",
        lambda a: a[0] if len(a) == 2 and "utf" in a[1].lower()
        else None,
    )
    # null-safe equality (operands consume quoted literals explicitly,
    # so plain re.sub is literal-safe here)
    s = re.sub(
        r"('(?:[^'\\]|\\.)*'|[\w.]+|\([^()]*\))\s*<=>\s*"
        r"('(?:[^'\\]|\\.)*'|[\w.]+|\([^()]*\))",
        r"(\1 IS NOT DISTINCT FROM \2)", s,
    )
    # trunc(x, 'fmt') — Hive's date truncation (returns yyyy-MM-dd)
    _TRUNC_FMT = {"mm": "month", "month": "month", "mon": "month",
                  "yyyy": "year", "yy": "year", "year": "year",
                  "q": "quarter"}

    def _trunc_date(a):
        if len(a) != 2:
            return None
        fm = re.fullmatch(r"\s*'(\w+)'\s*", a[1])
        if fm is None:
            if re.match(r"(?is)^\s*cast\s*\(\s*null\b", a[1]):
                # NULL format → NULL (GenericUDFTrunc)
                return "CAST(NULL AS DATE)"
            return None
        unit = _TRUNC_FMT.get(fm.group(1).lower())
        if not unit:
            # an INVALID literal format is NULL in Hive, not an error
            return "CAST(NULL AS DATE)"
        return (
            f"CAST(date_trunc('{unit}', CAST({a[0]} AS TIMESTAMP)) "
            "AS DATE)"
        )

    s = _rewrite_calls(s, "trunc", _trunc_date)
    # from_utc_timestamp(ts, tz) → double AT TIME ZONE hop. Duck reads
    # 'GMT+8'/'UTC+8' as plain UTC — fixed offsets must spell as the
    # POSIX-inverted Etc/GMT-8 zone.

    def _from_utc_ts(a):
        if len(a) != 2:
            return None
        tz = a[1].strip()
        zm = re.fullmatch(
            r"'(?:GMT|UTC)([+-])(\d{1,2})(?::00)?'", tz
        )
        if zm:
            inv = "-" if zm.group(1) == "+" else "+"
            tz = f"'Etc/GMT{inv}{int(zm.group(2))}'"
        return (
            f"((TRY_CAST({a[0]} AS TIMESTAMP) AT TIME ZONE 'UTC') "
            f"AT TIME ZONE {tz})"
        )

    s = _rewrite_calls(s, "from_utc_timestamp", _from_utc_ts)

    # to_utc_timestamp(ts, tz) — the inverse hop: interpret the naive
    # timestamp in tz, render it in UTC (same POSIX zone inversion)
    def _to_utc_ts(a):
        if len(a) != 2:
            return None
        tz = a[1].strip()
        zm = re.fullmatch(
            r"'(?:GMT|UTC)([+-])(\d{1,2})(?::00)?'", tz
        )
        if zm:
            inv = "-" if zm.group(1) == "+" else "+"
            tz = f"'Etc/GMT{inv}{int(zm.group(2))}'"
        return (
            f"((TRY_CAST({a[0]} AS TIMESTAMP) AT TIME ZONE {tz}) "
            "AT TIME ZONE 'UTC')"
        )

    s = _rewrite_calls(s, "to_utc_timestamp", _to_utc_ts)
    # Hive's SQL-standard length spellings duck lacks: character
    # semantics → length(), byte semantics → strlen()
    for _nm in ("character_length", "char_length"):
        s = _rewrite_calls(
            s, _nm,
            lambda a: f"length({a[0]})" if len(a) == 1 else None,
        )
    s = _rewrite_calls(
        s, "octet_length",
        lambda a: f"strlen({a[0]})" if len(a) == 1 else None,
    )
    # Hive interval literals → duck spellings: INTERVAL '2' YEAR →
    # INTERVAL 2 YEAR; the compound YEAR TO MONTH / DAY TO SECOND
    # forms unpack into duck's multi-unit string literal
    s = re.sub(
        r"(?i)\binterval\s+'(\d+)'\s+"
        r"(year|month|day|hour|minute|second)s?\b",
        r"INTERVAL \1 \2", s,
    )
    s = re.sub(
        r"(?i)\binterval\s+'(\d+)-(\d+)'\s+year(\s+to\s+month)?\b",
        lambda m: (
            f"INTERVAL '{m.group(1)} years {m.group(2)} months'"
        ),
        s,
    )
    s = re.sub(
        r"(?i)\binterval\s+'(\d+)\s+(\d+):(\d+):(\d+(?:\.\d+)?)'"
        r"\s+day(\s+to\s+second)?\b",
        lambda m: (
            f"INTERVAL '{m.group(1)} days {m.group(2)} hours "
            f"{m.group(3)} minutes {m.group(4)} seconds'"
        ),
        s,
    )
    # ---- r12 translation batch 5 ----
    # binary(x) under a digest/crc: the blob IS x's utf8 bytes, and
    # the VARCHAR overloads hash those same bytes — strip the wrapper
    s = re.sub(
        r"(?is)\b(md5|sha1|sha2|sha|crc32)\s*\(\s*binary\s*\("
        r"([^()]*)\)\s*",
        r"\1(\2", s,
    )
    # Hive sha is sha1's alias
    s = re.sub(r"(?is)\bsha\s*\(", "sha1(", s)
    # digest of a NULL binary: duck's overloads are VARCHAR-only
    s = re.sub(
        r"(?is)\b(md5|sha1|sha2|crc32)\s*\(\s*cast\s*\(\s*null\s+as"
        r"\s+binary\s*\)\s*\)",
        r"\1(CAST(NULL AS VARCHAR))", s,
    )
    # 3-arg parse_url (QUERY key extraction) → the dedicated UDF
    s = re.sub(
        r"(?is)\bparse_url\s*\(([^(),]+,[^(),]+,[^()]+)\)",
        r"parse_url3(\1)", s,
    )
    # Hive chr() (UDFChr.java:56-79): n<0 → '', n==0 (mod 256) → the
    # NUL string, else chr(n % 256)
    s = _rewrite_calls(
        s, "chr",
        lambda a: (
            "(CASE WHEN TRY_CAST({0} AS BIGINT) < 0 THEN '' "
            "ELSE chr(CAST(TRY_CAST({0} AS BIGINT) % 256 AS INT)) "
            "END)".format(a[0])
            if len(a) == 1 and "TRY_CAST" not in a[0] else None
        ),
    )
    # bround(x) = bround(x, 0); duck's round_even needs both args
    s = _rewrite_calls(
        s, "bround",
        lambda a: f"round_even({a[0]}, 0)" if len(a) == 1 else (
            f"round_even({a[0]}, {a[1]})" if len(a) == 2 else None
        ),
    )
    # size(collection) → len (lists; Hive's size covers maps too —
    # duck len handles both since 0.10)
    s = _rewrite_calls(
        s, "size",
        lambda a: f"len({a[0]})" if len(a) == 1 else None,
    )
    # typed-timestamp columns compared with numeric literals: Hive
    # compares at seconds-since-epoch (vectorization_7.q)
    s = re.sub(
        r"(?is)\b(ctimestamp[12])\s*(<=|>=|<>|!=|=|<|>)\s*"
        r"(-?\d+(?:\.\d+)?(?:E-?\d+)?)(?![\w.])",
        r"epoch(\1) \2 \3", s,
    )
    # abs/negation over the alltypesorc int columns promote like
    # Java's int math instead of erroring at the column width
    s = re.sub(
        r"(?is)\babs\s*\(\s*(ctinyint|csmallint|cint)\s*\)",
        r"abs(CAST(\1 AS BIGINT))", s,
    )
    # -(MIN(ctinyint)) wraps at the byte width in Hive/Spark
    # (-(-128) stays -128); duck's negation errors — negate at
    # BIGINT, wrap back (vectorization_not.q)
    def _neg_wrap(mm):
        span = 256 if mm.group(2).lower() == "ctinyint" else 65536
        half = span // 2
        inner = f"-TRY_CAST({mm.group(1)}({mm.group(2)}) AS BIGINT)"
        return (
            f"((({inner}) % {span} + {span} + {half}) % {span} "
            f"- {half})"
        )

    s = re.sub(
        r"(?is)\(\s*-\s*\(\s*(MIN|MAX)\s*\(\s*"
        r"(ctinyint|csmallint)\s*\)\s*\)\s*\)",
        _neg_wrap, s,
    )
    # log family: duck ERRORS on non-positive operands where
    # Hive/Spark return NULL (vector_coalesce.q's log2(cint))
    for _lf in ("log2", "log10", "ln"):
        s = _rewrite_calls(
            s, _lf,
            (lambda name: lambda a: (
                f"(CASE WHEN ({a[0]}) > 0 THEN {name}({a[0]}) END)"
                if len(a) == 1 and "CASE WHEN" not in a[0] else None
            ))(_lf),
        )
    # pmod(a, b) — Hive's positive modulus; DuckDB has only %
    s = _rewrite_calls(
        s, "pmod",
        lambda a: (
            f"((({a[0]}) % ({a[1]}) + ({a[1]})) % ({a[1]}))"
            if len(a) == 2 else None
        ),
    )
    # CAST/TRY_CAST ... AS STRING — duck's column type is VARCHAR
    s = _sub_nonliteral(r"(?i)\bAS\s+STRING\b", "AS VARCHAR", s)
    # locate(needle, haystack[, pos]) → instr with Hive's 1-based
    # from-pos semantics (GenericUDFLocate)

    def _locate(a):
        if len(a) == 2:
            return f"instr({a[1]}, {a[0]})"
        if len(a) == 3:
            sub = f"instr(substr({a[1]}, {a[2]}), {a[0]})"
            return (
                f"(CASE WHEN {sub} = 0 THEN 0 "
                f"ELSE {sub} + {a[2]} - 1 END)"
            )
        return None

    s = _rewrite_calls(s, "locate", _locate)
    # Hive's regexp_replace replaces EVERY occurrence; DuckDB's
    # replaces only the first unless passed the 'g' option
    # (input18.q: regexp_replace(value,'\t','+') over 'val_0\t3\t7')
    s = _rewrite_calls(
        s, "regexp_replace",
        lambda a: (
            f"regexp_replace({a[0]}, {a[1]}, {a[2]}, 'g')"
            if len(a) == 3 else None
        ),
    )
    # Hive CAST(integral AS TIMESTAMP) counts epoch MILLISECONDS
    # (boolean → 0/1 ms), CAST(floating AS TIMESTAMP) counts SECONDS
    # (int.timestamp.conversion defaults, mirrored by the engine) —
    # duck has no such cast. Keyed to the alltypesorc fixture's typed
    # column names (vectorized_timestamp_ints_casts.q).
    def _epoch_ts_cast(a):
        if len(a) != 1:
            return None
        mm = re.match(
            r"(?is)^\s*((?:\w+\.)?c(tinyint|smallint|int|bigint|"
            r"float|double|boolean[12])"
            r"(?:\s*\*\s*\d+)?)\s+AS\s+TIMESTAMP\s*$",
            a[0],
        )
        if mm:
            op = mm.group(1)
            if "boolean" in mm.group(2):
                op = f"({op})::INT"
            div = (
                "1.0" if mm.group(2) in ("float", "double") else "1000.0"
            )
            return (
                f"CAST(to_timestamp(CAST({op} AS DOUBLE) / {div}) "
                "AS TIMESTAMP)"
            )
        sm = re.match(
            r"(?is)^\s*((?:\w+\.)?cstring\d|substr\s*\(.*\))\s+AS\s+"
            r"TIMESTAMP\s*$",
            a[0],
        )
        if sm:
            # Hive string→timestamp yields NULL on junk text
            return f"TRY_CAST({sm.group(1)} AS TIMESTAMP)"
        return None

    s = _rewrite_calls(s, "cast", _epoch_ts_cast)
    # Hive CAST to DATE/TIMESTAMP yields NULL on invalid values
    # ('2002-02-31'); duck's plain CAST errors — TRY_CAST matches
    # Hive. LITERAL operands only: column casts must stay as-written
    # for the int→timestamp epoch translation downstream
    # (vectorized_timestamp_ints_casts.q).
    s = _rewrite_calls(
        s, "cast",
        lambda a: (
            (lambda mm: (
                f"TRY_CAST({mm.group(1)} AS {mm.group(2).upper()})"
                if mm else None
            ))(
                re.match(
                    r"(?is)^(\s*(?:'[^']*'|null)\s*)"
                    r"AS\s+(TIMESTAMP|DATE)\s*$",
                    a[0],
                )
            )
        ) if len(a) == 1 else None,
    )
    # from_unixtime(epoch[, fmt]) — common Hive patterns only

    def _from_unixtime(a):
        fmt = "%Y-%m-%d %H:%M:%S"
        if len(a) == 2:
            fm = re.fullmatch(r"\s*'([^']*)'\s*", a[1])
            if not fm:
                return None
            fmt = fm.group(1)
            for h, d in _HFMT:
                fmt = fmt.replace(h, d)
            if "%" not in fmt:
                return None
        elif len(a) != 1:
            return None
        return f"strftime(to_timestamp({a[0]}), '{fmt}')"

    s = _rewrite_calls(s, "from_unixtime", _from_unixtime)
    # months_between/add_months/substring_index/sha2 run as python
    # UDFs over VARCHAR args — wrap the date-ish operands so DATE/
    # TIMESTAMP inputs coerce (duck does not implicit-cast them)

    def _varchar_arg_wrapper(nm, varchar_positions):
        def fn(a):
            wrapped = [
                f"CAST({x} AS VARCHAR)" if i in varchar_positions
                else x
                for i, x in enumerate(a)
            ]
            return nm + "(" + ", ".join(wrapped) + ")"
        return fn

    s = _rewrite_calls(
        s, "months_between", _varchar_arg_wrapper("months_between",
                                                  {0, 1})
    )
    s = _rewrite_calls(
        s, "add_months", _varchar_arg_wrapper("add_months", {0})
    )
    s = _rewrite_calls(
        s, "substring_index",
        _varchar_arg_wrapper("substring_index", {0}),
    )
    s = _rewrite_calls(s, "sha2", _varchar_arg_wrapper("sha2", {0}))
    # COALESCE(string_col, <int literal>): Hive's common type is
    # STRING — quote the literal so duck agrees. Keyed to KNOWN
    # string fixture columns: a numeric expression arg must NOT trip
    # it (coalesce(CAST(cint AS INT), 0) stays integer —
    # vector_coalesce.q/llap_uncompressed.q)
    _STR_COLS = re.compile(
        r"(?is)\b(key|value|cstring\d|ds|hr|p_name|p_comment)\b"
    )
    s = _rewrite_calls(
        s, "coalesce",
        lambda a: (
            "coalesce(" + ", ".join(
                f"CAST({x} AS VARCHAR)"
                if re.fullmatch(r"\s*\d+\s*", x)
                or not _STR_COLS.search(x) else x
                for x in a
            ) + ")"
        ) if len(a) > 1
        and any(_STR_COLS.search(x) for x in a)
        and any(
            re.fullmatch(r"\s*\d+\s*", x) or not _STR_COLS.search(x)
            for x in a
        )
        # the engine-emitted hash folds coalesce an INT-returning
        # UDF with 0 — integer is the right common type there
        and not any("__hive_hash" in x for x in a)
        else None,
    )
    # empty array() literal
    s = re.sub(r"(?i)\barray\s*\(\s*\)", "[]", s)
    # reference TEST-JAR aggregate registrations are behaviorally the
    # builtins (create_udaf.q / create_genericudaf.q) — rename FIRST so
    # the coercion rules below see the builtin spellings
    s = re.sub(r"\btest_max\s*\(", "max(", s, flags=re.IGNORECASE)
    s = re.sub(r"\btest_avg\s*\(", "avg(", s, flags=re.IGNORECASE)
    # Hive's std/stddev/variance are POPULATION forms
    # (FunctionRegistry: std/stddev → GenericUDAFStd, variance →
    # GenericUDAFVariance); DuckDB's bare spellings are SAMPLE forms
    s = re.sub(r"\bstd\s*\(", "stddev_pop(", s, flags=re.IGNORECASE)
    s = re.sub(r"\bstddev\s*\(", "stddev_pop(", s, flags=re.IGNORECASE)
    s = re.sub(r"\bvariance\s*\(", "var_pop(", s, flags=re.IGNORECASE)
    # sum_list(array(a, b, ...)) sums every element toLong
    # (GenericUDAFSumList) — spell it as a bigint sum of the elements
    s = _rewrite_calls(
        s, "sum_list",
        lambda a: (
            "sum("
            + " + ".join(
                f"TRY_CAST({x} AS BIGINT)"
                for x in _split_top_args(
                    re.match(r"(?is)^\s*array\s*\((.*)\)\s*$", a[0])
                    .group(1)
                )
            )
            + ")"
        ) if len(a) == 1
        and re.match(r"(?is)^\s*array\s*\(.*\)\s*$", a[0]) else None,
    )
    # Hive interval literal spellings DuckDB doesn't share
    s = re.sub(
        r"(?i)\binterval\s+'(\d+)-(\d+)'\s+year\s+to\s+month\b",
        lambda mm: f"INTERVAL '{int(mm.group(1)) * 12 + int(mm.group(2))} months'",
        s,
    )
    def _dts(mm):
        d, h, mi, sec = mm.groups()
        return (f"INTERVAL '{d} days {h} hours {mi} minutes "
                f"{sec} seconds'")
    s = re.sub(
        r"(?i)\binterval\s+'(\d+)\s+(\d+):(\d+):(\d+(?:\.\d+)?)'\s+"
        r"day\s+to\s+second\b",
        _dts, s,
    )
    s = re.sub(
        r"(?i)\binterval\s+'(\d+)'\s+(year|month|day|hour|minute|second)\b",
        r"INTERVAL '\1 \2s'", s,
    )
    # Hive's SQL-standard floor(ts TO unit) = date_trunc
    s = re.sub(
        r"(?i)\bfloor\s*\(\s*([\w.]+)\s+to\s+"
        r"(year|quarter|month|week|day|hour|minute|second)\s*\)",
        r"date_trunc('\2', \1)", s,
    )
    # array(...) literals — DuckDB spells them [...] (no array() fn)
    s = _rewrite_calls(
        s, "array", lambda a: "[" + ", ".join(a) + "]" if a else None
    )
    # Hive map(k1,v1,k2,v2,...) → DuckDB MAP {k1: v1, ...}
    s = _rewrite_calls(
        s, "map",
        lambda a: (
            "MAP {" + ", ".join(
                f"{a[i]}: {a[i + 1]}" for i in range(0, len(a) - 1, 2)
            ) + "}"
        ) if len(a) >= 2 and len(a) % 2 == 0 else None,
    )
    # Hive array subscripts are 0-based; DuckDB lists are 1-based
    s = re.sub(r"\[(\d+)\]", lambda mm: f"[{int(mm.group(1)) + 1}]", s)
    # Hive bround = HALF_EVEN (banker's) rounding = DuckDB round_even
    s = re.sub(r"\bbround\s*\(", "round_even(", s, flags=re.IGNORECASE)
    # shiftrightunsigned: logical shift = shift on the unsigned view
    s = _rewrite_calls(
        s, "shiftrightunsigned",
        lambda a: (
            f"CAST(CAST({a[0]} AS UBIGINT) >> ({a[1]}) AS BIGINT)"
        ) if len(a) == 2 else None,
    )
    # sort_array(collect_set/list(x)) — the only order-deterministic
    # spellings of Hive's collection aggregates
    s = re.sub(
        r"(?is)\bsort_array\s*\(\s*collect_set\s*\(([^()]+)\)\s*\)",
        r"list_sort(list(DISTINCT \1))", s,
    )
    s = re.sub(
        r"(?is)\bsort_array\s*\(\s*collect_list\s*\(([^()]+)\)\s*\)",
        r"list_sort(list(\1))", s,
    )
    s = re.sub(r"(?is)\bsort_array\s*\(", "list_sort(", s)
    # binary(x) → BLOB cast
    s = _rewrite_calls(
        s, "binary",
        lambda a: f"CAST({a[0]} AS BLOB)" if len(a) == 1 else None,
    )
    # DuckDB refuses its reserved words as BARE aliases right after a
    # closing paren (cast(x as int) key) — Hive allows them; insert AS
    s = re.sub(
        r"(?i)([)'])\s+(key|value|type|end|row|rows|range|order|limit)"
        r"\b(?=\s*(?:,|\bfrom\b))",
        r"\1 AS \2", s,
    )
    # LATERAL VIEW explode(arr) t AS col → DuckDB's UNNEST-in-FROM
    s = re.sub(
        r"(?is)\blateral\s+view\s+explode\s*"
        r"\(([^()]*(?:\([^()]*\))*[^()]*)\)\s+(\w+)\s+as\s+(\w+)",
        r", UNNEST(\1) AS \2(\3)", s,
    )
    # bare explode() outside LATERAL VIEW (handled above) → UNNEST
    s = re.sub(r"(?i)\bexplode\s*\(", "UNNEST(", s)
    # udtfCount2() emits the row count twice (GenericUDTFCount2)
    um = re.match(
        r"(?is)^\s*select\s+udtfcount2\s*\(\s*\)\s+from\s+(\w+)\s*$", s
    )
    if um:
        t = um.group(1)
        return (
            f"SELECT * FROM (SELECT count(*) FROM {t} "
            f"UNION ALL SELECT count(*) FROM {t}) u"
        )
    # HiveQL double quotes are STRING LITERALS (never identifiers by
    # default) — convert them to single quotes BEFORE backticks take
    # the double-quote spelling ("val_2" = 'val_2', index_bitmap2.q;
    # "2016-12-30" dates, date_withtimestamp.q)
    def _dq(m):
        return "'" + m.group(1).replace("'", "''") + "'"

    out: list[str] = []
    q = None
    i = 0
    while i < len(s):
        ch = s[i]
        if q == "'":
            out.append(ch)
            if ch == "'":
                q = None
            i += 1
        elif ch == "'":
            q = "'"
            out.append(ch)
            i += 1
        elif ch == '"':
            j = s.find('"', i + 1)
            if j < 0:
                out.append(ch)
                i += 1
            else:
                out.append(_dq(re.match(r'"([^"]*)"', s[i:])))
                i = j + 1
        else:
            out.append(ch)
            i += 1
    s = "".join(out)
    # backquoted identifiers → ANSI double quotes
    s = re.sub(r"`([^`]*)`", r'"\1"', s)

    # REGEX column specs (hive.support.quoted.identifiers=none —
    # `[k].*`, ambiguous_col.q; `[kv]+.+`, current_date_timestamp.q):
    # expand against the declared columns of the qualifier's table or
    # the single plain FROM table
    def _regex_cols(mm):
        qual, pat = mm.group(1), mm.group(2)
        if not re.search(r"[\[\]*+|?^$]", pat):
            return mm.group(0)
        if qual:
            amap = {
                (al or t).lower(): t.lower()
                for t, al in re.findall(
                    r'(?is)\b(?:from|join)\s+["`]?(\w+)["`]?'
                    r"(?:\s+(?:as\s+)?(\w+))?",
                    s,
                )
            }
            # `(select * from t) a` exposes t's columns under a
            amap.update({
                al.lower(): t.lower()
                for t, al in re.findall(
                    r"(?is)\(\s*select\s+\*\s+from\s+"
                    r'["`]?(\w+)["`]?\s*\)\s*(\w+)',
                    s,
                )
            })
            known = _DUCK_TABLE_COLS.get(amap.get(qual.lower(), ""))
        else:
            fm2 = re.search(r'(?is)\bfrom\s+["`]?(\w+)["`]?', s)
            known = _DUCK_TABLE_COLS.get(
                fm2.group(1).lower()
            ) if fm2 else None
        if known is None:
            return mm.group(0)
        try:
            matched = [
                c for c in known[0] if re.fullmatch(pat, c)
            ]
        except re.error:
            return mm.group(0)
        if not matched:
            return mm.group(0)
        pre = f"{qual}." if qual else ""
        return ", ".join(
            pre + (f'"{c}"' if c in ("key", "value") else c)
            for c in matched
        )

    s = re.sub(r'(?:(\w+)\.)?"([^"]+)"', _regex_cols, s)
    # Hive integer division keyword
    s = re.sub(r"\bDIV\b", "//", s, flags=re.IGNORECASE)
    # Hive spells GROUPING SETS after a redundant GROUP BY column list;
    # DuckDB wants GROUP BY GROUPING SETS directly
    s = re.sub(
        r"\bGROUP\s+BY\s+(?:[^()]|\([^()]*\))*?\s*GROUPING\s+SETS\b",
        "GROUP BY GROUPING SETS", s, flags=re.IGNORECASE,
    )
    # JOIN with the condition in WHERE (no ON clause) is Hive's
    # old-style inner join = a cross join + filter
    # Hive/MySQL chained joins with ONE trailing ON — `A JOIN B JOIN C
    # ON (...)` (mrr.q) — don't parse in duck: the ON-less links
    # become CROSS JOIN (inner-join condition placement is equivalent)
    s = re.sub(
        r'(?is)\bjoin\s+(\((?:[^()]|\([^()]*\))*\)|[\w."]+)'
        r"(\s+(?:as\s+)?\w+)?\s+(?=join\b)",
        r"CROSS JOIN \1\2 ", s,
    )
    # an OUTER JOIN with NO on-clause before WHERE
    # (subquery_notexists.q's correlated LEFT JOIN) → ON TRUE
    s = re.sub(
        r'(?is)\b((?:left|right|full)\s+(?:outer\s+)?join\s+'
        r'(?:\((?:[^()]|\([^()]*\))*\)|[\w."]+)'
        r"(?:\s+(?:as\s+)?\w+)?)\s+(?=where\b)",
        r"\1 ON TRUE ", s,
    )
    if not re.search(r"\bON\b", s, re.IGNORECASE) and not re.search(
        r"\bUSING\s*\(", s, re.IGNORECASE  # named-column join keeps JOIN
    ) and re.search(
        r"\bJOIN\b", s, re.IGNORECASE
    ) and not re.search(
        r"\b(LEFT|RIGHT|FULL|SEMI|ANTI|CROSS|OUTER)\s+JOIN\b",
        s, re.IGNORECASE,
    ):
        s = re.sub(r"\bJOIN\b", "CROSS JOIN", s, flags=re.IGNORECASE)
    # Hive LIMIT offset,count → LIMIT count OFFSET offset
    s = re.sub(
        r"\bLIMIT\s+(\d+)\s*,\s*(\d+)", r"LIMIT \2 OFFSET \1", s,
        flags=re.IGNORECASE,
    )
    s = re.sub(r"\bLEFT\s+SEMI\s+JOIN\b", "SEMI JOIN", s, flags=re.IGNORECASE)
    # inside window specs (and WINDOW clause definitions), Hive's
    # DISTRIBUTE BY / SORT BY are synonyms for PARTITION BY / ORDER BY
    # — convert them FIRST so the layout-directive strip below cannot
    # corrupt a window spec
    if re.search(r"\bwindow\s+\w+\s+as\s*\(", s, re.IGNORECASE):
        # duck can't COPY a named window that carries a frame clause
        # (cbo_rp_windowing_2.q's `over (w3 rows ...)` refinements) —
        # inline the definitions with the engine's own rewrite, then
        # the OVER(...) bodies get the Hive→ANSI spelling conversion
        from hive_2_3_2_spark.hiveql_rewrites import (
            _rewrite_named_windows,
        )

        inlined = _rewrite_named_windows(s)
        if inlined:
            s = inlined

    def _conv_window(m):
        body = m.group(2)
        body = re.sub(r"\bdistribute\s+by\b", "partition by", body,
                      flags=re.IGNORECASE)
        body = re.sub(r"\bsort\s+by\b", "order by", body,
                      flags=re.IGNORECASE)
        body = re.sub(r"\bcluster\s+by\b", "partition by", body,
                      flags=re.IGNORECASE)
        return m.group(1) + body + ")"

    s = re.sub(
        r"((?:\bover|\bwindow\s+\w+\s+as)\s*\()([^()]*)\)",
        _conv_window, s, flags=re.IGNORECASE,
    )
    if re.search(r"\bwindow\s+\w+\s+as\b", s, re.IGNORECASE):
        # chained window defs — `window w1 as (...), w2 as (...)` —
        # convert the continuations' bodies too (gated on windowing
        # keywords so CTE `name as (select...)` bodies are untouched)
        s = re.sub(
            r"(,\s*\w+\s+as\s*\()"
            r"((?:[^()]*\b(?:distribute|sort|cluster|partition|order|"
            r"rows|range)\b[^()]*))\)",
            _conv_window, s, flags=re.IGNORECASE,
        )
    # data-layout directives: the comparator is order-insensitive and
    # LIMIT-without-ORDER statements are filtered out upstream, so
    # dropping them preserves the compared multiset. The operand list
    # may be a parenthesized (even nested) tuple — CLUSTER BY
    # ((key),(value)), ambiguitycheck.q — handled first as one balanced
    # group, then the plain comma-list form.
    s = re.sub(
        r"\b(?:CLUSTER|DISTRIBUTE|SORT)\s+BY\s*"
        r"\((?:[^()]|\((?:[^()]|\((?:[^()]|\([^()]*\))*\))*\))*\)"
        r"\s*(?=\bLIMIT\b|\)|$)",
        " ", s, flags=re.IGNORECASE,
    )
    s = re.sub(
        r"\b(?:CLUSTER|DISTRIBUTE|SORT)\s+BY\s+[\w.,\s]+?(?=\bLIMIT\b|\)|$)",
        " ", s, flags=re.IGNORECASE,
    )
    # string-vs-number comparison coerces through double in Hive.
    # These operand-pattern rules MUST NOT see string literals — a
    # literal like "value2-1" (parquet_join.q) would otherwise rewrite
    # its CONTENTS into TRY_CAST noise.
    s = _sub_nonliteral(
        rf"\b({_IDENT})\s*(<=|>=|<>|!=|=|<|>)\s*(\d+(?:\.\d+)?)(?![\w.])",
        r"TRY_CAST(\1 AS DOUBLE) \2 \3", s,
    )
    s = _sub_nonliteral(
        rf"(?<![\w.])(\d+(?:\.\d+)?)\s*(<=|>=|<>|!=|=|<|>)\s*({_IDENT})\b",
        r"\1 \2 TRY_CAST(\3 AS DOUBLE)", s,
    )
    # string arithmetic coerces through double — but NOT for the
    # alltypesorc columns that are ALREADY numeric: coercing
    # cbigint*0 to double manufactures a -0.0 Spark's integer
    # arithmetic never produces (vectorized_casts.q)
    def _num_arith(mm):
        if re.fullmatch(
            r"(?is)(?:\w+\.)?c(?:tinyint|smallint|int|bigint|float|"
            r"double|boolean[12])",
            mm.group(1),
        ):
            return mm.group(0)
        return (
            f"TRY_CAST({mm.group(1)} AS DOUBLE) "
            f"{mm.group(2)} {mm.group(3)}"
        )

    s = _sub_nonliteral(
        rf"\b({_IDENT})\s*([+\-*/%])\s*(\d+(?:\.\d+)?)(?![\w.])",
        _num_arith, s,
    )
    # a bitwise OR whose left side the arith coercion just turned
    # DOUBLE needs integral operands in duck ((empno*2)|1,
    # multi_column_in.q) — ::BIGINT restores the integral type
    s = _sub_nonliteral(r"\)\s*\|(?!\|)", ")::BIGINT |", s)
    # TYPED-timestamp casts (vectorized_casts.q): Hive converts
    # through SECONDS (TimestampWritable.getSeconds / getDouble);
    # duck's cast raises — epoch() spells it
    s = re.sub(
        r"(?is)\bCAST\s*\(\s*(ctimestamp[12])\s+AS\s+"
        r"(INT|INTEGER|BIGINT|SMALLINT|TINYINT)\s*\)",
        lambda m: (
            f"TRY_CAST(floor(epoch({m.group(1)})) AS {m.group(2)})"
        ),
        s,
    )
    s = re.sub(
        r"(?is)\bCAST\s*\(\s*(ctimestamp[12])\s+AS\s+"
        r"(DOUBLE|FLOAT)\s*\)",
        lambda m: f"TRY_CAST(epoch({m.group(1)}) AS {m.group(2)})",
        s,
    )
    # bigint → int narrows with Java wraparound in Hive/Spark; duck
    # overflows to NULL — keyed to the alltypesorc bigint column
    s = re.sub(
        r"(?is)\bCAST\s*\(\s*(cbigint)\s+AS\s+(?:INT|INTEGER)\s*\)",
        r"TRY_CAST(((\1 % 4294967296 + 4294967296 + 2147483648) "
        r"% 4294967296 - 2147483648) AS INTEGER)",
        s,
    )
    # the engine's Hive-getBoolean emission `(CAST(x AS INT) != 0)`:
    # duck's cast ROUNDS where the Java (int) truncates — trunc first
    s = re.sub(
        r"(?is)\(CAST\(([^()]+) AS INT\) != 0\)",
        r"(TRY_CAST(TRUNC(TRY_CAST(\1 AS DOUBLE)) AS BIGINT) != 0)",
        s,
    )
    # Hive CAST(x AS INT-family) TRUNCATES the double toward zero
    # (mapreduce5.q golden: CAST(15/10 AS INT) = 1); DuckDB's cast
    # ROUNDS (15/10 -> 2). Applied only when the operand divides —
    # the one shape where the fraction systematically appears; a
    # blanket wrap through DOUBLE would corrupt huge-bigint casts.
    def _cast_trunc(a):
        if len(a) != 1 or (
            "/" not in a[0]
            and not re.search(r"\bc(?:float|double)\b", a[0], re.I)
        ):
            # fires only where a fraction systematically appears: a
            # division, or the alltypesorc float/double columns
            # (vectorized_casts.q) — a blanket DOUBLE round-trip would
            # corrupt huge-bigint casts
            return None
        mm = re.match(
            r"(?is)^(.+?)\s+AS\s+"
            r"(INT|INTEGER|BIGINT|SMALLINT|TINYINT)\s*$",
            a[0],
        )
        if not mm:
            return None
        return (
            f"CAST(TRUNC(CAST({mm.group(1)} AS DOUBLE)) AS "
            f"{mm.group(2).upper()})"
        )

    s = _rewrite_calls(s, "cast", _cast_trunc)
    # sum/avg over substr(string) — Hive's GenericUDAFSum string path
    s = re.sub(
        r"\b(sum|avg)\s*\(\s*(DISTINCT\s+)?(substr(?:ing)?\([^()]*\))\s*\)",
        r"\1(\2TRY_CAST(\3 AS DOUBLE))", s, flags=re.IGNORECASE,
    )
    # bitwise shifts run as registered python UDFs with Java's
    # distance-mask + wraparound semantics (64-bit — the 32-bit INT
    # divergence stays the adjudicated java_shift_mask mismatch
    # class); duck's native << errors on overflow instead of wrapping
    # date_add/date_sub(expr, n) — DuckDB's date_sub is a different
    # (part, start, end) function entirely; paren-aware so CAST
    # arguments survive (udf_date_add.q)
    s = _rewrite_calls(
        s, "date_add",
        lambda a: (f"(TRY_CAST({a[0]} AS DATE) + CAST({a[1]} AS INT))")
        if len(a) == 2 else None,
    )
    s = _rewrite_calls(
        s, "date_sub",
        lambda a: (f"(TRY_CAST({a[0]} AS DATE) - CAST({a[1]} AS INT))")
        if len(a) == 2 else None,
    )
    # hour/minute/second/last_day over STRING operands: Hive coerces
    # through timestamp/date; Hive also accepts bare 'HH:MM:SS'
    def _ts_extract(fn):
        def fix(a):
            if len(a) != 1:
                return None
            arg = a[0].strip()
            if re.fullmatch(r"'\d{1,2}:\d{2}:\d{2}(?:\.\d+)?'", arg):
                arg = "'1970-01-01 " + arg[1:]
            return f"{fn}(TRY_CAST({arg} AS TIMESTAMP))"
        return fix

    for _fn in ("hour", "minute", "second"):
        s = _rewrite_calls(s, _fn, _ts_extract(_fn))
    s = _rewrite_calls(
        s, "last_day",
        lambda a: f"last_day(TRY_CAST({a[0]} AS DATE))"
        if len(a) == 1 else None,
    )
    # Hive's multi-argument COUNT(DISTINCT a, b, ...) counts distinct
    # tuples with NO null field — DuckDB count is single-argument
    def _multi_distinct(a):
        if len(a) < 2 or not re.match(r"(?is)^\s*distinct\b", a[0]):
            return None
        first = re.sub(r"(?is)^\s*distinct\s+", "", a[0])
        items = [first] + [x.strip() for x in a[1:]]
        notnull = " AND ".join(f"({x}) IS NOT NULL" for x in items)
        tup = ", ".join(items)
        return (f"count(DISTINCT CASE WHEN {notnull} "
                f"THEN ({tup}) END)")

    s = _rewrite_calls(s, "count", _multi_distinct)
    # string-typed arithmetic between two columns coerces through
    # double in Hive (retry-only: the raw statement already failed).
    # '*' is excluded (SELECT * FROM would match) and SQL keywords
    # never rewrite as operands.
    _ARITH_KW = {"select", "from", "where", "and", "or", "not", "on",
                 "by", "as", "join", "in", "is", "then", "else",
                 "when", "case", "end", "between", "like", "group",
                 "order", "sort", "distribute", "cluster", "having",
                 "limit", "union", "all", "distinct", "interval"}

    def _arith(mm):
        a, op, b = mm.group(1), mm.group(2), mm.group(3)
        if a.lower() in _ARITH_KW or b.lower() in _ARITH_KW:
            return mm.group(0)
        # NO outer parens: the replacement must be exactly in-place —
        # wrapping (a + b) changes precedence when the left operand
        # belonged to a surrounding product (20000 * a + b)
        return f"TRY_CAST({a} AS DOUBLE) {op} TRY_CAST({b} AS DOUBLE)"

    # the \b before the lookahead stops backtracking from shortening
    # the right ident (TRY_CAST → TRY_CAS) to sneak past (?!\s*\()
    s = _sub_nonliteral(
        rf"\b({_IDENT})\s*([+/%])\s*({_IDENT})\b(?!\s*\()", _arith, s,
    )
    # numeric UDAFs over string columns — Hive's GenericUDAFSum/Avg/
    # Variance coerce string operands through double
    s = re.sub(
        r"\b(sum|avg|variance|var_pop|var_samp|stddev|stddev_pop|"
        r"stddev_samp)\s*\(\s*((?:DISTINCT\s+)?)"
        r"((?:\w+\.)?(?:\"[\w]+\"|[a-zA-Z_]\w*))"
        r"\s*\)",
        r"\1(\2TRY_CAST(\3 AS DOUBLE))", s, flags=re.IGNORECASE,
    )
    # Hive struct(a, b) names fields col1..colN; named_struct
    # alternates name literals and values — both are struct_pack
    for _ in range(8):  # innermost calls live inside replacements
        before_ns = s
        s = _rewrite_calls(
            s, "named_struct",
            lambda a: (
                "struct_pack("
                + ", ".join(
                    f"{a[k].strip(chr(39))} := {a[k + 1]}"
                    for k in range(0, len(a) - 1, 2)
                )
                + ")"
            ) if len(a) >= 2 and len(a) % 2 == 0 else None,
        )
        if s == before_ns:
            break
    def _struct_field(k: int, v: str) -> str:
        # Spark names a BARE-COLUMN struct() arg after the column and
        # computed args colN — mirror that so the canonicalized dict
        # keys align (Hive itself says col1..colN; the engine follows
        # Spark here, a name-only divergence)
        v = v.strip()
        if re.fullmatch(r"[A-Za-z_][\w.]*", v):
            return f"{v.split('.')[-1]} := {v}"
        return f"col{k + 1} := {v}"

    s = _rewrite_calls(
        s, "struct",
        lambda a: "struct_pack(" + ", ".join(
            _struct_field(k, v) for k, v in enumerate(a)
        ) + ")" if a else None,
    )
    # scalar spellings DuckDB names differently
    s = _rewrite_calls(
        s, "get_json_object",
        lambda a: f"json_extract_string({a[0]}, {a[1]})"
        if len(a) == 2 else None,
    )
    s = _rewrite_calls(
        s, "sha2",
        lambda a: f"sha256({a[0]})"
        if len(a) == 2 and a[1].strip() in ("0", "256") else None,
    )
    s = _rewrite_calls(
        s, "datediff",
        lambda a: (
            f"date_diff('day', TRY_CAST({a[1]} AS DATE), "
            f"TRY_CAST({a[0]} AS DATE))"
        ) if len(a) == 2 else None,
    )
    _TRUNC_PARTS = {
        "MM": "month", "MON": "month", "MONTH": "month",
        "YY": "year", "YYYY": "year", "YEAR": "year", "Q": "quarter",
    }
    s = _rewrite_calls(
        s, "trunc",
        lambda a: (
            f"CAST(date_trunc('"
            f"{_TRUNC_PARTS[a[1].strip().strip(chr(39)).upper()]}'"
            f", TRY_CAST({a[0]} AS TIMESTAMP)) AS DATE)"
        ) if len(a) == 2
        and a[1].strip().strip(chr(39)).upper() in _TRUNC_PARTS
        else None,
    )
    # Hive percentile = exact linear-interpolation percentile
    # (GenericUDAFPercentile) = DuckDB quantile_cont; array literals
    # become DuckDB lists
    if re.search(r"\bpercentile\s*\(", s, re.IGNORECASE):
        s = _rewrite_calls(
            s, "array",
            lambda a: "[" + ", ".join(a) + "]" if a else None,
        )
        s = _rewrite_calls(
            s, "percentile",
            lambda a: (
                f"quantile_cont(TRY_CAST({a[0]} AS DOUBLE), {a[1]})"
            ) if len(a) == 2 else None,
        )
    return s


def _hive_types_to_duck(cols: str) -> str:
    """Hive complex-type spellings → DuckDB's, innermost-first:
    array<T> → T[], map<K,V> → MAP(K,V), struct<a:T,...> →
    STRUCT(a T, ...); string → VARCHAR (DuckDB has no STRING in
    column DDL)."""
    cols = re.sub(r"(?i)\bstring\b", "VARCHAR", cols)
    # Hive's bare DECIMAL is decimal(10,0) (HiveDecimal defaults);
    # DuckDB's bare DECIMAL is DECIMAL(18,3) — a p1=100 partition
    # value would render '100.000' and fake a fixture divergence
    cols = re.sub(r"(?i)\bdecimal\b(?!\s*\()", "DECIMAL(10,0)", cols)
    for _ in range(8):  # bounded nesting
        if "<" not in cols:
            break
        def _inner(mm):
            kind, body = mm.group(1).lower(), mm.group(2)
            if kind == "array":
                return f"{body}[]"
            if kind == "map":
                return f"MAP({body})"
            # struct<a:T,b:U> → STRUCT(a T, b U)
            fields = [f.strip() for f in body.split(",")]
            return "STRUCT(" + ", ".join(
                f.replace(":", " ", 1) for f in fields
            ) + ")"
        nxt = re.sub(
            r"(?i)\b(array|map|struct)\s*<([^<>]*)>", _inner, cols
        )
        if nxt == cols:
            break
        cols = nxt
    return cols


#: duck-side declared column order per created table: name →
#: (all column names incl. partitions, partition column names,
#:  duck-side column types in declaration order)
_DUCK_TABLE_COLS: dict[str, tuple[list[str], list[str], list[str]]] = {}


def duck_exec_statements(s: str) -> list[str]:
    """HiveQL prelude DDL/DML → DuckDB statements. Partitioned CREATE
    TABLE folds the partition columns into the column list (DuckDB has
    no partition dirs — the data is what's compared); INSERT ...
    PARTITION drops the clause; INSERT OVERWRITE becomes DELETE +
    INSERT. Returns [] for statements DuckDB doesn't need (function
    DDL — the python equivalents register once up front)."""
    if re.match(
        r"(?is)^\s*(?:create|drop)\s+temporary\s+(?:function|macro)\b",
        s,
    ):
        return []
    dm = re.match(
        r"(?is)^\s*drop\s+(?:table|view)\s+(?:if\s+exists\s+)?"
        r"`?(\w+)`?",
        s,
    )
    if dm:
        # a later same-named CREATE is a fresh relation — stale
        # recorded types would mis-wrap its INSERTs (cbo_rp_lineage2's
        # 2-col dest1 after an 11-col one elsewhere)
        _DUCK_TABLE_COLS.pop(dm.group(1).lower(), None)
    if re.search(r"\busing\s+'", s, re.IGNORECASE) and re.search(
        r"\b(?:MAP|REDUCE)\s", s, re.IGNORECASE
    ):
        # Hive's MAP/REDUCE transform spellings normalize to SELECT
        # TRANSFORM (the engine's own rewrite) so the FROM-first
        # splitter sees select-headed branches and the identity-cat
        # oracle can model them (mapreduce3.q)
        from hive_2_3_2_spark.hiveql_rewrites import (
            _rewrite_map_reduce_transform,
        )

        s = _rewrite_map_reduce_transform(s)
    m = re.match(
        r"(?is)^\s*create\s+table\s+(?:if\s+not\s+exists\s+)?"
        r"`?(\w+)`?\s*\((.*?)\)\s*"
        r"(?:partitioned\s+by\s*\((.*?)\))?\s*"
        r"(?:clustered\s+by\s*\((?:[^()`]|`[^`]*`)*\)\s*"
        r"(?:sorted\s+by\s*\((?:[^()`]|`[^`]*`)*\)\s*)?"
        r"into\s+\d+\s+buckets\s*)?"
        r"(?:row\s+format\s+delimited[^;]*?"
        r"|row\s+format\s+serde\s+'[^']*'\s*"
        r"(?:with\s+serdeproperties\s*\([^)]*\)\s*)?)?"
        r"(?:stored\s+as\s+(?:inputformat\s+'[^']*'\s+"
        r"outputformat\s+'[^']*'|\w+))?"
        r"\s*(?:location\s+'[^']*')?"
        r"\s*(?:tblproperties\s*\(.*\))?\s*$",
        s,
    )
    if m:
        cols = m.group(2).strip()
        part_names = []
        if m.group(3):
            cols += ", " + m.group(3).strip()
            part_names = [
                seg.strip().split()[0].strip('`').lower()
                for seg in _split_top_args(m.group(3))
            ]
        col_names = [
            seg.strip().split()[0].strip('`').lower()
            for seg in _split_top_args(cols)
        ]
        # backticked column names (reserved words, innerjoin.q's
        # `inner`) → ANSI quotes BEFORE the bare key/value quoting
        cols = re.sub(r"`([^`]*)`", r'"\1"', cols)
        cols = re.sub(r'(?is)(?<!")\bkey\b(?!")', '"key"', cols)
        cols = re.sub(r'(?is)(?<!")\bvalue\b(?!")', '"value"', cols)
        cols = _hive_types_to_duck(cols)
        # remember declared/partition column order AND the duck-side
        # types — INSERT ... PARTITION translations with MIXED
        # static+dynamic specs need the order to land values in the
        # right columns, and the lenient INSERT retry (duck_lenient)
        # needs the types to spell Hive's implicit insert conversions
        duck_types = []
        for seg in _split_top_args(cols):
            seg = re.sub(r"(?is)\s+COMMENT\s+'[^']*'", "", seg).strip()
            parts = seg.split(None, 1)
            duck_types.append(parts[1] if len(parts) > 1 else "VARCHAR")
        _DUCK_TABLE_COLS[m.group(1).lower()] = (
            col_names, part_names, duck_types
        )
        return [f'CREATE TABLE "{m.group(1)}" ({cols})']
    cm2 = re.match(
        r"(?is)^\s*create\s+table\s+(?:if\s+not\s+exists\s+)?"
        r"`?(\w+)`?",
        s,
    )
    if cm2:
        # CREATE shape the typed regex could not parse (CTAS, exotic
        # clauses): drop any stale recorded types for the name
        _DUCK_TABLE_COLS.pop(cm2.group(1).lower(), None)
    s = re.sub(
        r"(?is)\bstored\s+as\s+\w+\s+as\s+select\b", " AS SELECT ", s
    )
    fm = None
    if re.match(r"(?is)^\s*from\b", s):
        # find the first TOP-LEVEL 'insert' (the source clause may be
        # a parenthesized subquery containing anything)
        depth = 0
        q = None
        for i in range(len(s)):
            ch = s[i]
            if q:
                if ch == q:
                    q = None
            elif ch in "'\"":
                q = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0 and s[i:i + 7].lower() == "insert " :
                fm = (s[s.lower().index("from") + 4:i].strip(),
                      s[i:].strip())
                break
    if fm:
        src_clause, rest = fm
        out = []
        branches = re.split(
            r"(?i)(?=insert\s+(?:into|overwrite)\s+table\s)", rest
        )
        for br in branches:
            br = br.strip()
            if not br:
                continue
            bm = re.match(
                r"(?is)^insert\s+(into|overwrite)\s+table\s+"
                r"`?(\w+)`?\s*(?:partition\s*\(([^)]*)\)\s*)?"
                r"(select\b.*)$",
                br,
            )
            if not bm:
                return [duck_translate(s)]
            verb, t, pspec, body = bm.groups()
            # inject the shared FROM before the first TOP-LEVEL tail
            # clause — keyword text inside parens (an OVER's
            # `distribute by`, cbo_rp_windowing_2.q) must not split
            tail_pos = None
            depth, i, q = 0, 0, None
            while i < len(body):
                ch = body[i]
                if q:
                    if ch == q:
                        q = None
                elif ch in "'\"":
                    q = ch
                elif ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                elif depth == 0 and (ch.isalpha() or ch == "_"):
                    wm2 = re.match(r"\w+", body[i:])
                    w1 = wm2.group(0).lower()
                    if w1 in ("where", "limit", "window"):
                        tail_pos = i
                        break
                    if w1 in ("group", "order", "sort",
                              "distribute", "cluster") and re.match(
                        r"\s+by\b", body[i + wm2.end():],
                        re.IGNORECASE,
                    ):
                        tail_pos = i
                        break
                    i += wm2.end()
                    continue
                i += 1
            if tail_pos is not None:
                body = (body[:tail_pos] + f" FROM {src_clause} "
                        + body[tail_pos:])
            else:
                body = body + f" FROM {src_clause}"
            rebuilt = f"insert {verb} table `{t}` "
            if pspec:
                rebuilt += f"partition ({pspec}) "
            rebuilt += body
            out.extend(duck_exec_statements(rebuilt))
        return out
    im = re.match(
        r"(?is)^\s*insert\s+(into|overwrite)\s+table\s+`?(\w+)`?\s*"
        r"(?:partition\s*\(([^)]*)\)\s*)?((?:select|values|from)\b.*)$",
        s,
    )
    if im:
        verb, t, pspec, body = im.groups()
        out = []
        spec_items: list[tuple[str, str | None]] = []
        if pspec:
            spec_items = [
                (it.split("=", 1)[0].strip().lower(),
                 it.split("=", 1)[1].strip() if "=" in it else None)
                for it in pspec.split(",")
            ]
        statics = [v for _n, v in spec_items if v is not None]
        n_dyn = sum(1 for _n, v in spec_items if v is None)
        known = _DUCK_TABLE_COLS.get(t.lower())
        body_t = duck_translate(body)
        if verb.lower() == "overwrite" and n_dyn and known:
            # DYNAMIC-partition overwrite swaps only the partitions the
            # select TOUCHES (Hive nonstrict semantics) — a blanket
            # DELETE would drop untouched partitions
            # (partitions_filter_default.q: the c=NULL partition must
            # survive the second overwrite). Statics interleave per the
            # declared partition order (llap_smb.q).
            all_cols, part_cols = known[0], known[1]
            n_data = len(all_cols) - len(part_cols)
            aliases = [f"__c{i}" for i in range(n_data + n_dyn)]
            dyn_iter = iter(aliases[n_data:])
            proj = [
                f'{a} AS "{c}"'
                for a, c in zip(aliases[:n_data], all_cols[:n_data])
            ]
            for (_nm, v), pcol in zip(spec_items, part_cols):
                src = v if v is not None else next(dyn_iter)
                proj.append(f'{src} AS "{pcol}"')
            out.append(
                "CREATE OR REPLACE TEMP TABLE __dyn_ins AS SELECT "
                + ", ".join(proj)
                + f" FROM ({body_t}) __p(" + ", ".join(aliases) + ")"
            )
            conds = " AND ".join(
                f'd."{p}" IS NOT DISTINCT FROM "{t}"."{p}"'
                for p in part_cols
            )
            out.append(
                f'DELETE FROM "{t}" WHERE EXISTS '
                f"(SELECT 1 FROM __dyn_ins d WHERE {conds})"
            )
            out.append(f'INSERT INTO "{t}" SELECT * FROM __dyn_ins')
            out.append("DROP TABLE __dyn_ins")
            return out
        if verb.lower() == "overwrite":
            if statics and not n_dyn:
                # fully-static overwrite clears only that partition
                conds = [
                    f"{nm} = {v}" for nm, v in spec_items
                ]
                out.append(
                    f'DELETE FROM "{t}" WHERE ' + " AND ".join(conds)
                )
            else:
                out.append(f'DELETE FROM "{t}"')
        if statics:
            if n_dyn and known:
                # append with a MIXED spec: statics interleave per the
                # declared partition order, not append last
                all_cols, part_cols = known[0], known[1]
                n_data = len(all_cols) - len(part_cols)
                aliases = [f"__c{i}" for i in range(n_data + n_dyn)]
                proj = list(aliases[:n_data])
                dyn_iter = iter(aliases[n_data:])
                for _nm, v in spec_items:
                    proj.append(v if v is not None else next(dyn_iter))
                out.append(
                    f'INSERT INTO "{t}" SELECT '
                    + ", ".join(proj)
                    + f" FROM ({body_t}) __p("
                    + ", ".join(aliases) + ")"
                )
            else:
                extra = ", ".join(statics)
                out.append(
                    f"INSERT INTO {t} SELECT *, {extra} "
                    f"FROM ({body_t}) __p"
                )
        else:
            known2 = _DUCK_TABLE_COLS.get(t.lower())
            if (
                known2 and len(known2) > 2 and known2[2]
                and re.match(r"(?is)^\s*select\b", body_t)
            ):
                # spell Hive's insert conversion (trunc-not-round for
                # int targets) whenever the declared types are known
                out.append(_typed_insert(t, body_t, known2[2]))
            else:
                out.append(f'INSERT INTO "{t}" {body_t}')
        return out
    return [duck_translate(s)]


def _typed_insert(t: str, body: str, types: list[str]) -> str:
    """INSERT with Hive's insert-conversion semantics spelled out:
    TRY_CAST per declared column (junk strings → NULL like the
    UDFToX converters), and int-family targets TRUNCATE fractional
    sources toward zero — Hive converts via the Java (int)/(long)
    casts where DuckDB's cast ROUNDS (cbo_rp_windowing_2.q's
    cume_dist() into an INT column is golden 0, duck rounded to 1).
    Integral-valued sources keep the DIRECT cast so huge bigints
    don't round-trip through double."""
    aliases = [f"__t{i}" for i in range(len(types))]
    proj = []
    for a, ty in zip(aliases, types):
        if ty.upper() in (
            "INT", "INTEGER", "BIGINT", "SMALLINT", "TINYINT"
        ):
            d = f"TRY_CAST({a} AS DOUBLE)"
            proj.append(
                f"CASE WHEN {d} IS NOT NULL AND TRUNC({d}) <> {d} "
                f"THEN TRY_CAST(TRUNC({d}) AS {ty}) "
                f"ELSE TRY_CAST({a} AS {ty}) END"
            )
        else:
            proj.append(f"TRY_CAST({a} AS {ty})")
    return (
        f'INSERT INTO "{t}" SELECT ' + ", ".join(proj)
        + f" FROM ({body}) __tp({', '.join(aliases)})"
    )


#: aggregates whose Hive evaluators coerce ANY operand through double
#: (GenericUDAFSum/Average/Variance resolve string args via the
#: implicit string→double conversion)
_NUMERIC_ONLY_AGGS = (
    "sum", "avg", "variance", "var_pop", "var_samp", "std", "stddev",
    "stddev_pop", "stddev_samp",
)


def duck_lenient(s: str) -> str:
    """Second-level duck-side RETRY translation — coercions that are
    exactly Hive's implicit behavior but would be wrong to apply
    blindly (they change result types), so they only run after both
    the raw statement and duck_translate have failed:

    1. numeric-only aggregates coerce their argument (expression args
       included — duck_translate's base rule handles bare columns
       only) through TRY_CAST(... AS DOUBLE);
    2. an INSERT INTO a table with KNOWN declared duck types TRY_CASTs
       every projected column to its target type — Hive's insert
       conversion path (UDFToInteger & co) NULLs junk strings where
       DuckDB's strict insert cast errors ('' → INT, input7.q)."""
    for agg in _NUMERIC_ONLY_AGGS:
        def _wrap(a, _agg=agg):
            if len(a) != 1 or "TRY_CAST" in a[0].upper():
                return None
            arg = a[0].strip()
            dm = re.match(r"(?is)^distinct\s+(.*)$", arg)
            inner = dm.group(1) if dm else arg
            pre = "DISTINCT " if dm else ""
            duck_agg = {
                "std": "stddev_pop", "stddev": "stddev_pop",
                "variance": "var_pop",
            }.get(_agg, _agg)
            return f"{duck_agg}({pre}TRY_CAST({inner} AS DOUBLE))"

        s = _rewrite_calls(s, agg, _wrap)
    # Hive CASTs never throw — junk strings become NULL (UDFToInteger
    # & co return null on NumberFormatException); duck's CAST errors
    # (udf3.q: CAST('' AS INT)). \b keeps TRY_CAST itself untouched.
    s = _sub_nonliteral(r"\bCAST\s*\(", "TRY_CAST(", s, re.IGNORECASE)
    # `ident IN (SELECT <numeric expr> ...)`: Hive compares through
    # double (lineage3.q's key in (select key+18 ...)) — the subquery
    # side was already arith-coerced; coerce the outer operand too
    s = re.sub(
        r"(?is)\b(\w+)\s+(not\s+)?in\s*\(\s*select\s+TRY_CAST",
        lambda m: (
            f"TRY_CAST({m.group(1)} AS DOUBLE) "
            f"{m.group(2) or ''}in (select TRY_CAST"
        ),
        s,
    )
    # Hive resolves a bare ORDER BY ident against the statement's
    # OUTPUT schema first; duck raises Ambiguous when a join input
    # shares the name (authorization_view_3.q's `order by key`,
    # auto_join_without_localtask.q's `order by key, value` under
    # `select a.*`). Resolve Hive's way: replace each ident that
    # names exactly one output column with its select-list ordinal.
    om = re.search(
        r"(?is)\border\s+by\s+(\w+(?:\s*,\s*\w+)*)\b(?!\s*[(.])", s
    )
    if om is not None and re.search(r"\bjoin\b", s, re.IGNORECASE):
        sm = re.match(
            r"(?is)^\s*select\s+(?:distinct\s+)?(.*?)\s+from\b", s
        )
        if sm is not None:
            # table-alias map for `alias.*` select items
            amap = {
                (al or t).lower(): t.lower()
                for t, al in re.findall(
                    r'(?is)\b(?:from|join)\s+["`]?(\w+)["`]?'
                    r"(?:\s+(?:as\s+)?(\w+))?",
                    s,
                )
            }
            names: list[str | None] = []
            for it in _split_top_args(sm.group(1)):
                it = it.strip()
                ssm = re.fullmatch(r"(\w+)\.\*", it)
                if ssm:
                    known = _DUCK_TABLE_COLS.get(
                        amap.get(ssm.group(1).lower(), "")
                    )
                    if known is None:
                        names = []
                        break
                    names.extend(c.lower() for c in known[0])
                    continue
                am = re.match(
                    r"(?is)^.*\bas\s+`?(\w+)`?\s*$", it
                ) or re.match(r"(?is)^(?:[\w.]+\.)?(\w+)\s*$", it)
                names.append(am.group(1).lower() if am else None)
            if names:
                idents = [
                    x.strip() for x in om.group(1).split(",")
                ]
                if all(
                    names.count(x.lower()) == 1 for x in idents
                ):
                    ords = ", ".join(
                        str(names.index(x.lower()) + 1)
                        for x in idents
                    )
                    s = (
                        s[:om.start()]
                        + f"order by {ords}"
                        + s[om.end():]
                    )
    im = re.match(
        r'(?is)^\s*insert\s+into\s+["`]?(\w+)["`]?\s+'
        r"((?:select|values|from)\b.*)$",
        s,
    )
    if im:
        t, body = im.groups()
        known = _DUCK_TABLE_COLS.get(t.lower())
        if known and len(known) > 2 and known[2]:
            s = _typed_insert(t, body, known[2])
    return s


def _duckmap(v):
    """DuckDB's python client materializes MAP cells as
    {'key': [...], 'value': [...]} pairs — convert (recursively) to a
    plain dict so the shared canonicalizer sees the same shape Spark
    returns."""
    if isinstance(v, dict):
        if set(v.keys()) == {"key", "value"} and isinstance(
            v["key"], list
        ) and isinstance(v["value"], list) and len(v["key"]) == len(
            v["value"]
        ):
            return {
                _duckmap(k): _duckmap(x)
                for k, x in zip(v["key"], v["value"])
            }
        return {k: _duckmap(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return type(v)(_duckmap(x) for x in v)
    return v


#: self-adjudication for spark_errors raised as the engine's OWN typed
#: error — the deliberate out-of-scope surface names itself
_TYPED_GAP_ADJ = (
    "typed engine gap (HiveQLUnsupportedError): the engine refuses "
    "this surface deliberately and the err text names why — the error "
    "IS the adjudication (negative-corpus behavior, not a crash)"
)

#: per-file adjudications for UNTYPED spark errors (real Spark
#: rejections the engine does not catch) — same contract as
#: MISMATCH_ADJUDICATIONS: a null adjudication fails the handoff gate
SPARK_ERROR_ADJUDICATIONS: dict[str, str] = {
    "quotedid_basic": (
        "quoted-identifier ESCAPED backtick (`x+1``` is x+1` — "
        "doubled-backtick escape inside the name): Spark's parser has "
        "no backtick-escape in this engine's mangling path; the "
        "downstream selects are skipped with the fixture. Narrow "
        "lexer-level gap, recorded."
    ),
    "quotedid_smb": (
        "same doubled-backtick escape family as quotedid_basic where "
        "present; bucketed-join selects over the special-char columns "
        "replay in tests/test_qfile_bucketmapjoin_family.py instead."
    ),
    "struct_in_view": (
        "a COLUMN literally named `default`: Hive resolves "
        "default.src.`end`.key as column-field chain where Spark "
        "reads `default` as the database qualifier — resolution-order "
        "divergence on a reserved-word column name, recorded "
        "(struct-IN itself value-verifies in vector_struct_in)."
    ),
    "binary_output_format": (
        "TRANSFORM ... RECORDWRITER with a custom output format "
        "class — custom serde/recordwriter classes are out of scope "
        "per SURVEY §2.2."
    ),
    "input34": (
        "TRANSFORM with ROW FORMAT SERDE <custom class>: Spark's "
        "script transform supports Hive's DELIMITED row format only "
        "(UNSUPPORTED_FEATURE.TRANSFORM_NON_HIVE) — custom serde "
        "classes are out of scope per SURVEY §2.2."
    ),
    "masking_7": (
        "ROW__ID virtual column (ACID row identity — "
        "VirtualColumn.java:57): no Spark equivalent over parquet; "
        "same documented family as BLOCK__OFFSET__INSIDE__FILE. The "
        "masking functions themselves value-verify in "
        "tests/test_qfile_mask_family.py."
    ),
    "masking_8": (
        "ROW__ID virtual column (see masking_7) plus a CTAS with "
        "duplicate unaliased '12' constants — Hive auto-names them "
        "_c1.._cN where Spark raises AMBIGUOUS_REFERENCE; narrow "
        "autoname gap, recorded."
    ),
    "quotedid_stats": (
        "same doubled-backtick escape family as quotedid_basic "
        "(`x+1``` is x+1` inside the name) — lexer-level gap, "
        "recorded; plain special-char quoted identifiers (including "
        "SKEWED BY on them) work and are pinned."
    ),
}

#: duck_errors carry a status: 'duck_cannot' = DuckDB lacks the
#: capability (interval literals, collect_set/list, histogram sketch,
#: aes, grouping__id, windowed RANGE frames over named windows) —
#: translation can't help; 'untranslated' = a translation COULD exist
#: but hasn't been written (the batch-N backlog the verdict tracks).
_DUCK_CANNOT_STMT = re.compile(
    r"(?is)\binterval_year_month\s*\(|\binterval_day_time\s*\("
    r"|\binterval\s+'[^']*'\s+(?:year|month|day|hour|minute|second)"
    r"|\bhistogram_numeric\s*\(|\baes_(?:en|de)crypt\s*\("
    r"|\bgrouping__id\b"
    r"|\bcollect_(?:set|list)\s*\("
    r"|\bwindow\s+\w+\s+as\s*\((?:[^()]|\([^)]*\))*\b(?:rows|range)"
    r"\s+between\b"
    r"|\btablesample\s*\(\s*bucket\b"  # duck has no bucket layout
)


def _duck_status(stmt: str) -> str:
    return (
        "duck_cannot" if _DUCK_CANNOT_STMT.search(stmt)
        else "untranslated"
    )


#: standing adjudications for value-sweep mismatches, keyed by .q
#: basename — written INTO the artifact so a fresh reader can audit a
#: mismatch without COVERAGE.md archaeology. A mismatch whose file has
#: no entry gets adjudication null, which tools/handoff_gate.py REFUSES
#: — an unadjudicated mismatch can't ship.
MISMATCH_ADJUDICATIONS: dict[str, str] = {
    "udf_bitwise_shiftright": (
        "java_shift_mask: Hive/Spark mask the shift distance to the "
        "operand width (Java << semantics, distance mod 32/64); DuckDB "
        "shifts past the width to 0. Spark matches the reference "
        "goldens (udf_bitwise_shiftright.q.out)."
    ),
    "vectorization_not": (
        "float-reduction-order artifact in ONE column of 18: "
        "VAR_SAMP(cbigint) % STDDEV_POP(cbigint) takes a modulo of "
        "~1e23-scale doubles, where the last-ulp difference of the "
        "parallel vs serial aggregation order amplifies to the shown "
        "delta; all other columns (including both inputs to the "
        "modulo) match to 9 significant digits."
    ),
    "subquery_notexists": (
        "duck-side gap: the correlated NOT EXISTS compares a STRING "
        "column to an INT column — Hive resolves the pair at DOUBLE "
        "(non-numeric strings → NULL, no match) where duck's strict "
        "INT32 conversion errors; a blanket double coercion of "
        "ident=ident equality would corrupt string joins, so this "
        "stays a recorded translation gap."
    ),
    "udf_bitwise_shiftleft": (
        "java_shift_mask (left-shift side): the oracle UDF models the "
        "64-bit Java semantics; Hive/Spark additionally WRAP at the "
        "operand's 32-bit width for INT inputs (4<<29 = "
        "-2147483648, 4<<33 = 64 on INT) where the 64-bit model "
        "keeps the wide value. Spark matches the reference goldens "
        "(udf_bitwise_shiftleft.q.out)."
    ),
    "udf_bitwise_shiftrightunsigned": (
        "java_shift_mask: same distance-mask divergence as shiftright "
        "— DuckDB zero-fills past the width; Spark matches the "
        "reference goldens."
    ),
    "udf_current_database": (
        "environment_identity: current_database() reflects each "
        "engine's own session database ('default' vs DuckDB's "
        "'memory'); the reference golden is 'default' — Spark matches."
    ),
    "udf_version": (
        "environment_identity: version() is the engine's own build "
        "string by design; the golden itself regexp-masks it."
    ),
    "udf_factorial": (
        "oracle_range: DuckDB computes factorial in 128-bit "
        "(factorial(21+) stays finite); Hive/Spark overflow bigint to "
        "NULL exactly as the reference golden records."
    ),
    "lineage2": (
        "oracle_rendering: sum(substr(value,5)) over VARCHAR — DuckDB "
        "sums as DOUBLE and renders '79.0'-style, Hive/Spark sum to "
        "the golden's integral rendering inside concat(); values agree "
        "numerically (verified r8)."
    ),
    "cbo_rp_lineage2": (
        "oracle_rendering: same statement as lineage2 — DuckDB's "
        "double rendering inside concat() vs the golden's integral "
        "form; numerically equal."
    ),
    "cbo_input26": (
        "tie_limit_subset: the inner 'order by a.ds limit 5' orders by "
        "a constant-per-partition column (non-total order) — both "
        "engines return a legitimate but different 5-row subset; the "
        "reference golden is itself one such subset."
    ),
}

#: standing adjudications for fixture-divergent tables that are NOT
#: auto-classified (class 'value' / 'row_count' need a human verdict;
#: tie_limit_subset and duck_*_err self-adjudicate). Keyed by
#: (file, table).
_CHAR_PAD = (
    "char-padding oracle artifact: Hive CHAR(N) reads back "
    "blank-padded to N — the engine pads per Hive's CHAR read "
    "semantics and matches the reference golden's padded form; "
    "DuckDB has no CHAR type, its fixture stores the bare VARCHAR. "
    "Values equal modulo the declared pad (evidence shows "
    "'val_0' + 15 spaces vs 'val_0')."
)
_DEC_ULP = (
    "double->decimal expansion artifact: the fixture casts double "
    "expressions to decimal(>16 significant digits); the engines "
    "differ in the 17th digit — beyond IEEE double precision, both "
    "are faithful expansions of the same double. Spark matches the "
    "reference golden's rendering (vector_decimal goldens pinned in "
    "tests/test_qfile_vector_decimal2.py)."
)
FIXTURE_ADJUDICATIONS: dict[tuple[str, str], str] = {
    ("char_nested_types", "char_nested_array"): _CHAR_PAD,
    ("char_nested_types", "char_nested_map"): _CHAR_PAD,
    ("char_nested_types", "char_nested_struct"): _CHAR_PAD,
    ("char_nested_types", "char_nested_cta"): _CHAR_PAD,
    ("char_nested_types", "char_nested_view"): _CHAR_PAD,
    ("char_2", "char_2"): _CHAR_PAD,
    ("vector_char_2", "char_2"): _CHAR_PAD,
    ("vector_char_simple", "char_2"): _CHAR_PAD,
    ("hybridgrace_hashjoin_1", "parttbl"): _CHAR_PAD,
    ("hybridgrace_hashjoin_1", "decimal_mapjoin"): _DEC_ULP,
    ("vector_decimal_math_funcs", "decimal_test"): _DEC_ULP,
    ("vector_reduce_groupby_decimal", "decimal_test"): _DEC_ULP,
    # r12: unlocked by the typed-insert translation — the CTAS casts
    # (cdouble*9.3)/13 to DECIMAL(23,14); evidence shows
    # '717.70961538461540' vs '...44', the 17th significant digit
    ("vector_between_in", "decimal_date_test"): _DEC_ULP,
    ("encryption_select_read_only_encrypted_tbl", "encrypted_table"): (
        "duck-side prelude cannot LOAD DATA INPATH (the encryption "
        "fixture loads kv1.txt from the test tree) — duck table stays "
        "empty while the engine loads 500 rows; selects over it are "
        "unverified here, not divergent (encryption zones themselves "
        "are out of scope per SURVEY §2.2)."
    ),
}


def _classify_fixture_divergence(
    sp_rows, du_rows, tie_limit: bool
) -> tuple[str, dict]:
    """(class, evidence) for a fixture whose two materializations
    disagree. Classes: tie_limit_subset (the build ran a LIMIT under a
    non-total order — both engines hold a legitimate subset),
    row_count, collation (same cells, aggregation-order strings
    differ), value (same count, genuinely different cells — the class
    that can hide a real engine write-path bug and always needs an
    adjudication)."""
    import collections

    sp_c = collections.Counter(sp_rows)
    du_c = collections.Counter(du_rows)
    sp_only = list((sp_c - du_c).elements())
    du_only = list((du_c - sp_c).elements())
    evidence = {
        "spark_rows": len(sp_rows),
        "duck_rows": len(du_rows),
        "first_spark_only": repr(sp_only[0])[:200] if sp_only else None,
        "first_duck_only": repr(du_only[0])[:200] if du_only else None,
    }
    if tie_limit:
        return "tie_limit_subset", evidence

    def _collate_key(row):
        return tuple(
            "".join(sorted(re.split(r"[^0-9A-Za-z.]+", v)))
            if isinstance(v, str) else v
            for v in row
        )

    if len(sp_rows) != len(du_rows):
        return "row_count", evidence
    if collections.Counter(
        _collate_key(r) for r in sp_rows
    ) == collections.Counter(_collate_key(r) for r in du_rows):
        return "collation", evidence
    return "value", evidence


def register_duck_test_fns(con) -> None:
    """DuckDB equivalents of the scalar test-jar UDFs (NULLs short-
    circuit via DuckDB's default null handling); the aggregates/UDTF
    translate structurally in duck_translate."""
    import codecs

    from duckdb.typing import INTEGER, VARCHAR

    con.create_function(
        "testlength", lambda s: len(s), [VARCHAR], INTEGER
    )
    con.create_function(
        "testlength2", lambda s: len(s), [VARCHAR], INTEGER
    )
    con.create_function(
        "test_udf_get_java_string", lambda s: s, [VARCHAR], VARCHAR
    )
    con.create_function(
        "rot13",
        lambda s: codecs.encode(str(s), "rot13"),
        [VARCHAR], VARCHAR,
    )
    # --- Hive hash() parity family (r12): duck-side equivalents of
    # the engine's __hive_hash_* Arrow UDFs, so the engine-rewritten
    # hash fold runs verbatim on the oracle (ObjectInspectorUtils
    # .hashCode semantics; scalar forms from functions/hive_hash) ---
    import datetime as _dt

    from duckdb.typing import BIGINT, DOUBLE, FLOAT, DATE, TIMESTAMP

    from hive_2_3_2_spark.functions.hive_hash import (
        _hash_one,
        hive_hash_double_py,
        hive_hash_float_py,
        hive_hash_long_py,
        hive_hash_timestamp_py,
    )

    def _hh_ts(ts):
        delta = ts - _dt.datetime(1970, 1, 1)
        us = (
            delta.days * 86_400_000_000
            + delta.seconds * 1_000_000
            + delta.microseconds
        )
        return hive_hash_timestamp_py(us)

    con.create_function(
        "__hive_hash_str", _hash_one, [VARCHAR], INTEGER
    )
    con.create_function(
        "__hive_hash_long", hive_hash_long_py, [BIGINT], INTEGER
    )
    con.create_function(
        "__hive_hash_double", hive_hash_double_py, [DOUBLE], INTEGER
    )
    con.create_function(
        "__hive_hash_float", hive_hash_float_py, [FLOAT], INTEGER
    )
    con.create_function("__hive_hash_ts", _hh_ts, [TIMESTAMP], INTEGER)
    con.create_function(
        "__hive_hash_date",
        lambda d: (d - _dt.date(1970, 1, 1)).days,
        [DATE], INTEGER,
    )
    # --- r12 translation batch 5: Hive scalar functions DuckDB lacks,
    # as python UDFs (udf_crc32/find_in_set/format_number/parse_url/
    # soundex/sha1 .q families) ---
    import zlib
    from urllib.parse import urlsplit, parse_qs

    con.create_function(
        "crc32", lambda s: zlib.crc32(s.encode()), [VARCHAR], BIGINT
    )
    con.create_function(
        "find_in_set",
        lambda s, lst: (
            0 if "," in s else (
                lst.split(",").index(s) + 1
                if s in lst.split(",") else 0
            )
        ),
        [VARCHAR, VARCHAR], INTEGER,
    )

    def _format_number(x, d):
        # GenericUDFFormatNumber: grouped thousands, d decimals
        return f"{float(x):,.{int(d)}f}"

    con.create_function(
        "format_number", _format_number, [DOUBLE, INTEGER], VARCHAR
    )

    def _parse_url(url, part):
        try:
            sp = urlsplit(url)
        except Exception:
            return None
        if part == "HOST":
            return sp.hostname
        if part == "PATH":
            return sp.path
        if part == "QUERY":
            return sp.query or None
        if part == "REF":
            return sp.fragment or None
        if part == "PROTOCOL":
            return sp.scheme
        if part == "AUTHORITY":
            return sp.netloc
        if part == "USERINFO":
            return (
                sp.netloc.rsplit("@", 1)[0] if "@" in sp.netloc
                else None
            )
        if part == "FILE":
            return sp.path + ("?" + sp.query if sp.query else "")
        return None

    con.create_function(
        "parse_url", _parse_url, [VARCHAR, VARCHAR], VARCHAR
    )
    con.create_function(
        "parse_url3",
        lambda url, part, key: (
            (parse_qs(urlsplit(url).query).get(key) or [None])[0]
            if part == "QUERY" else None
        ),
        [VARCHAR, VARCHAR, VARCHAR], VARCHAR,
    )

    def _soundex(s):
        # classic Soundex (GenericUDFSoundex wraps commons-codec)
        if not s or not s[0].isalpha():
            return s
        codes = {
            **dict.fromkeys("BFPV", "1"),
            **dict.fromkeys("CGJKQSXZ", "2"),
            **dict.fromkeys("DT", "3"), "L": "4",
            **dict.fromkeys("MN", "5"), "R": "6",
        }
        s = s.upper()
        out = s[0]
        prev = codes.get(s[0], "")
        for ch in s[1:]:
            c = codes.get(ch, "")
            if c and c != prev:
                out += c
                if len(out) == 4:
                    break
            if ch not in "HW":
                prev = c
        return (out + "000")[:4]

    con.create_function("soundex", _soundex, [VARCHAR], VARCHAR)
    con.create_function(
        "sha1",
        lambda s: hashlib.sha1(s.encode()).hexdigest(),
        [VARCHAR], VARCHAR,
    )
    # Java shift semantics: the distance masks to the operand width
    # (64-bit long here — the 32-bit INT divergence stays the
    # adjudicated java_shift_mask mismatch class); duck's << errors
    # on overflow instead of wrapping
    _M64 = (1 << 64) - 1

    def _wrap64(v):
        v &= _M64
        return v - (1 << 64) if v >= (1 << 63) else v

    con.create_function(
        "shiftleft",
        lambda a, b: _wrap64(a << (b & 63)), [BIGINT, BIGINT], BIGINT,
    )
    con.create_function(
        "shiftright",
        lambda a, b: a >> (b & 63), [BIGINT, BIGINT], BIGINT,
    )
    con.create_function(
        "shiftrightunsigned",
        lambda a, b: _wrap64((a & _M64) >> (b & 63)),
        [BIGINT, BIGINT], BIGINT,
    )
    # --- Hive date/string scalar functions DuckDB lacks (r11 batch 4;
    # args arrive as VARCHAR — duck_translate wraps them in CASTs) ---
    import calendar
    import datetime
    import hashlib

    from duckdb.typing import DOUBLE

    def _parse_dt(x):
        """Hive's LENIENT date parse (GregorianCalendar lenient mode):
        out-of-range fields ROLL OVER ('2002-02-31' → 2002-03-03,
        golden cell 0.06451613), a PARTIAL time like '10:39' is
        SKIPPED (full H:M:S counts — udf_months_between.q golden
        comments), unparseable → None."""
        if x is None:
            return None
        m = re.match(
            r"^\s*(\d{1,4})-(\d{1,2})-(\d{1,2})"
            r"(?:\s+(\d{1,2}):(\d{1,2}):(\d{1,2}))?",
            str(x),
        )
        if not m:
            return None
        y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
        yy, mm0 = divmod(y * 12 + (mo - 1), 12)
        if yy < 1:
            return None
        base = datetime.datetime(yy, mm0 + 1, 1)
        dt = base + datetime.timedelta(days=d - 1)
        if m.group(4) is not None:
            dt += datetime.timedelta(
                hours=int(m.group(4)), minutes=int(m.group(5)),
                seconds=int(m.group(6)),
            )
        return dt

    def _months_between(a, b):
        """GenericUDFMonthsBetween: same day-of-month or both last day
        → whole months; else (d1-d2 incl. time)/31 days, 8-digit
        round."""
        d1, d2 = _parse_dt(a), _parse_dt(b)
        if d1 is None or d2 is None:
            return None
        last1 = calendar.monthrange(d1.year, d1.month)[1] == d1.day
        last2 = calendar.monthrange(d2.year, d2.month)[1] == d2.day
        months = (d1.year - d2.year) * 12 + (d1.month - d2.month)
        if d1.day == d2.day or (last1 and last2):
            return round(float(months), 8)
        s1 = d1.day * 86400 + d1.hour * 3600 + d1.minute * 60 + d1.second
        s2 = d2.day * 86400 + d2.hour * 3600 + d2.minute * 60 + d2.second
        return round(months + (s1 - s2) / (31.0 * 86400), 8)

    def _add_months(d, n):
        """GenericUDFAddMonths: last-day input pins to the target
        month's last day (golden: 2014-02-28 -1 → 2014-01-31); other
        days clamp. Returns the yyyy-MM-dd string Hive returns."""
        dt = _parse_dt(d)
        if dt is None or n is None:
            return None
        n = int(n)
        y, m = divmod((dt.year * 12 + dt.month - 1) + n, 12)
        m += 1
        last_src = calendar.monthrange(dt.year, dt.month)[1]
        last_dst = calendar.monthrange(y, m)[1]
        day = last_dst if dt.day == last_src else min(dt.day, last_dst)
        return f"{y:04d}-{m:02d}-{day:02d}"

    def _substring_index(s_, delim, count):
        """MySQL/Hive substring_index semantics incl. negatives."""
        if s_ is None or delim is None or count is None:
            return None
        count = int(count)
        if delim == "" or count == 0:
            return ""
        parts = s_.split(delim)
        if count > 0:
            return delim.join(parts[:count])
        return delim.join(parts[count:])

    def _sha2(s_, bits):
        if s_ is None or bits is None:
            return None
        algo = {0: "sha256", 256: "sha256", 224: "sha224",
                384: "sha384", 512: "sha512"}.get(int(bits))
        if algo is None:
            return None
        return getattr(hashlib, algo)(s_.encode()).hexdigest()

    con.create_function(
        "months_between", _months_between, [VARCHAR, VARCHAR], DOUBLE
    )
    con.create_function(
        "add_months", _add_months, [VARCHAR, INTEGER], VARCHAR
    )
    con.create_function(
        "substring_index", _substring_index,
        [VARCHAR, VARCHAR, INTEGER], VARCHAR,
    )
    con.create_function("sha2", _sha2, [VARCHAR, INTEGER], VARCHAR)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="QFILE_SWEEP.json")
    ap.add_argument("--files", default="",
                    help="comma-separated .q basenames to sweep (debug)")
    args = ap.parse_args()

    import duckdb

    from hive_2_3_2_spark.engine import Engine
    from hive_2_3_2_spark.session import get_spark
    from tests.conftest import _norm

    spark = get_spark(app_name="qfile-value-sweep")
    eng = Engine(spark=spark)
    con = duckdb.connect()
    root = tempfile.mkdtemp(prefix="qsweep_")
    SRC = [(str(i % 83), f"val_{i % 83}") for i in range(500)]
    SRC1 = (
        [(str(k), f"val_{k}") for k in (66, 98, 128, 146, 150)]
        + [("", "")]
        + [(str(k), f"val_{k}") for k in (4, 8, 2, 5)]
    )
    spark.createDataFrame(SRC, "key string, value string").coalesce(
        1
    ).write.parquet(f"{root}/src")
    eng.register_table("src", f"{root}/src")
    spark.createDataFrame(SRC1, "key string, value string").coalesce(
        1
    ).write.parquet(f"{root}/src1")
    eng.register_table("src1", f"{root}/src1")
    prows = [
        (k, v, ds, hr)
        for ds in ("2008-04-08", "2008-04-09")
        for hr in ("11", "12")
        for k, v in SRC[:100]
    ]
    spark.createDataFrame(
        prows, "key string, value string, ds string, hr string"
    ).write.partitionBy("ds", "hr").parquet(f"{root}/srcpart")
    eng.register_table("srcpart", f"{root}/srcpart", ["ds", "hr"])
    # alltypesorc (the vectorization family's table) and over10k (the
    # windowing family's): deterministic synthetic rows with the
    # reference tables' column names/types, NULLs sprinkled per column
    # so three-valued logic is exercised
    def _n(i, period, v):
        return None if i % period == 0 else v

    atypes = [
        (
            _n(i, 11, (i * 7) % 256 - 128),
            _n(i, 13, (i * 131) % 32768 - 16384),
            _n(i, 7, (i * 12345) % 1000000 - 500000),
            _n(i, 17, (i * 1234567) % 10**12 - 5 * 10**11),
            _n(i, 5, float((i * 31) % 997) / 8),
            _n(i, 19, float((i * 677) % 100003) / 16),
            _n(i, 23, f"cvalue_{i % 61}"),
            _n(i, 29, f"dstring_{i % 37}"),
            _n(i, 31, f"1969-12-31 15:59:{i % 60:02d}.{i % 1000:03d}"),
            _n(i, 37, f"1969-12-31 16:00:{i % 60:02d}"),
            _n(i, 41, i % 2 == 0),
            _n(i, 43, i % 3 == 0),
        )
        for i in range(1, 1001)
    ]
    spark.createDataFrame(
        atypes,
        "ctinyint int, csmallint int, cint int, cbigint bigint, "
        "cfloat double, cdouble double, cstring1 string, cstring2 string, "
        "ctimestamp1 string, ctimestamp2 string, "
        "cboolean1 boolean, cboolean2 boolean",
    ).selectExpr(
        "cast(ctinyint as tinyint) ctinyint",
        "cast(csmallint as smallint) csmallint", "cint", "cbigint",
        "cast(cfloat as float) cfloat", "cdouble", "cstring1", "cstring2",
        "cast(ctimestamp1 as timestamp) ctimestamp1",
        "cast(ctimestamp2 as timestamp) ctimestamp2",
        "cboolean1", "cboolean2",
    ).coalesce(1).write.parquet(f"{root}/alltypesorc")
    eng.register_table("alltypesorc", f"{root}/alltypesorc")
    o10k = [
        (
            _n(i, 11, (i * 3) % 128),
            _n(i, 13, 256 + i % 251),
            _n(i, 7, 65536 + i % 4096),
            _n(i, 17, 4294967296 + (i * 13) % 100000),
            _n(i, 5, float((i * 29) % 10000) / 100),
            _n(i, 19, float((i * 83) % 5000) / 10),
            _n(i, 23, i % 2 == 0),
            _n(i, 29, f"user_{i % 127}"),
            _n(i, 31, f"2013-03-01 09:11:{i % 60:02d}.{i % 1000:03d}"),
            _n(i, 37, round(float(i % 9999) / 100, 2)),
        )
        for i in range(1, 1001)
    ]
    spark.createDataFrame(
        o10k,
        "t int, si int, i int, b bigint, f double, d double, "
        "bo boolean, s string, ts string, dec double",
    ).selectExpr(
        "cast(t as tinyint) t", "cast(si as smallint) si", "i", "b",
        "cast(f as float) f", "d", "bo", "s",
        "cast(ts as timestamp) ts", "dec",
    ).coalesce(1).write.parquet(f"{root}/over10k")
    eng.register_table("over10k", f"{root}/over10k")
    # cbo_t1/t2/t3 and part: the reference's EXACT fixture payloads
    # (data/files/cbo_t1.txt ff. — whitespace-variant keys and \\N
    # nulls; part_tiny.txt — \\x01-delimited), q_test_init.sql schemas
    def _cbo_rows(path):
        rows = []
        for line in open(path):
            f = line.rstrip("\n").split(",")
            f = [None if x == "\\N" else x for x in f]
            rows.append((
                f[0], f[1],
                int(f[2]) if f[2] is not None else None,
                float(f[3]) if f[3] is not None else None,
                None if f[4] is None else f[4] == "true",
            ))
        return rows

    REF = "/root/reference/data/files"
    for name in ("cbo_t1", "cbo_t2", "cbo_t3"):
        fname = name if name != "cbo_t2" else "cbo_t2"
        rows = _cbo_rows(f"{REF}/{fname}.txt")
        schema = "key string, value string, c_int int, c_float float, "
        schema += "c_boolean boolean"
        df = spark.createDataFrame(rows, schema)
        if name != "cbo_t3":
            from pyspark.sql import functions as _F

            df = df.withColumn("dt", _F.lit("2014"))
            df.coalesce(1).write.partitionBy("dt").parquet(f"{root}/{name}")
            eng.register_table(name, f"{root}/{name}", ["dt"])
        else:
            df.coalesce(1).write.parquet(f"{root}/{name}")
            eng.register_table(name, f"{root}/{name}")
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{root}/{name}/{'*/' if name != 'cbo_t3' else ''}"
            f"*.parquet'"
            + (", hive_partitioning=1)" if name != "cbo_t3" else ")")
        )
    prows_ = []
    for line in open(f"{REF}/part_tiny.txt"):
        f = line.rstrip("\n").split("\x01")
        prows_.append((
            int(f[0]), f[1], f[2], f[3], f[4], int(f[5]), f[6],
            float(f[7]), f[8],
        ))
    spark.createDataFrame(
        prows_,
        "p_partkey int, p_name string, p_mfgr string, p_brand string, "
        "p_type string, p_size int, p_container string, "
        "p_retailprice double, p_comment string",
    ).coalesce(1).write.parquet(f"{root}/part")
    eng.register_table("part", f"{root}/part")
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM "
        f"read_parquet('{root}/part/*.parquet')"
    )
    con.execute(
        f"CREATE VIEW alltypesorc AS SELECT * FROM "
        f"read_parquet('{root}/alltypesorc/*.parquet')"
    )
    con.execute(
        f"CREATE VIEW over10k AS SELECT * FROM "
        f"read_parquet('{root}/over10k/*.parquet')"
    )
    con.execute(
        f"CREATE VIEW src AS SELECT * FROM read_parquet('{root}/src/*.parquet')"
    )
    con.execute(
        f"CREATE VIEW src1 AS SELECT * FROM "
        f"read_parquet('{root}/src1/*.parquet')"
    )
    body = ", ".join(
        f"('{k}', '{v}', '{ds}', '{hr}')" for k, v, ds, hr in prows
    )
    con.execute(
        "CREATE VIEW srcpart AS SELECT * FROM (VALUES "
        + body + ") AS t(key, value, ds, hr)"
    )

    register_duck_test_fns(con)
    # base-fixture column orders (the created-table entries land via
    # duck_exec_statements; these pre-seed t.* expansion for the
    # harness tables)
    _DUCK_TABLE_COLS.setdefault(
        "src", (["key", "value"], [], ["VARCHAR", "VARCHAR"])
    )
    _DUCK_TABLE_COLS.setdefault(
        "src1", (["key", "value"], [], ["VARCHAR", "VARCHAR"])
    )
    _DUCK_TABLE_COLS.setdefault(
        "srcpart",
        (["key", "value", "ds", "hr"], ["ds", "hr"], ["VARCHAR"] * 4),
    )
    recs = extract_file_records()
    if args.files:
        only = set(args.files.split(","))
        recs = [r for r in recs if r["file"] in only]
    counts = {"match": 0, "match_translated": 0, "spark_err": 0,
              "duck_err": 0, "mismatch": 0, "mismatch_translated": 0,
              "prelude_err": 0, "prelude_skip": 0}
    mismatches = []
    spark_errs = []
    duck_errs: list[dict] = []
    fixture_divergent: list[dict] = []
    for rec in recs:
        broken = False
        checked: dict[str, bool] = {}
        created_set = set(rec["created"])
        duck_failed: dict[str, str] = {}
        # tables built (transitively) through a LIMIT: both engines
        # hold a legitimate but possibly different row subset — the
        # vector_outer_join small_alltypesorc chains derive from
        # ORDER BY ... LIMIT parents, so the tie propagates
        tie_tables: set[str] = set()
        for k2, s2 in rec["stmts"]:
            if k2 != "exec":
                continue
            tm = (
                _CTAS_PRELUDE.match(s2)
                or _CREATE_TBL_PRELUDE.match(s2)
                or _INSERT_PRELUDE.match(s2)
                or _CREATE_VIEW_PRELUDE.match(s2)
            )
            if tm:
                targets = {tm.group(1).lower()}
            elif re.match(r"(?is)^\s*from\b", s2):
                targets = {
                    t.lower() for t in re.findall(
                        r"insert\s+(?:into|overwrite)\s+table\s+"
                        r"`?(\w+)`?", s2, re.IGNORECASE,
                    )
                }
            else:
                continue
            if _LIMITED.search(s2) or (
                (_stmt_tables(s2) - targets) & tie_tables
            ):
                tie_tables |= targets

        def _fixture_ok(t, _checked=None):
            ck = _checked if _checked is not None else checked
            if t not in ck:
                sp = du = None
                err_cls = None
                try:
                    sp = sorted(
                        (tuple(_norm(v) for v in row)
                         for row in eng.sql(
                             f"select * from `{t}`").collect()),
                        key=repr,
                    )
                except Exception as e:
                    err_cls = ("spark_fixture_err",
                               " ".join(str(e).split())[:160])
                if err_cls is None:
                    try:
                        du = sorted(
                            (tuple(_norm(_duckmap(v)) for v in row)
                             for row in con.execute(
                                 f'SELECT * FROM "{t}"').fetchall()),
                            key=repr,
                        )
                    except Exception as e:
                        err_cls = ("duck_fixture_err",
                                   " ".join(str(e).split())[:160])
                ck[t] = err_cls is None and sp == du
                if not ck[t]:
                    if err_cls is not None:
                        cls, evidence = err_cls[0], {"err": err_cls[1]}
                        adjudication = (
                            "duck-side prelude could not build this "
                            "table (oracle translation gap) — the "
                            "selects over it are unverified here, not "
                            "divergent"
                        ) if cls == "duck_fixture_err" else None
                    elif t in duck_failed:
                        cls = "duck_prelude_err"
                        evidence = {"err": duck_failed[t],
                                    "spark_rows": len(sp),
                                    "duck_rows": len(du)}
                        adjudication = (
                            "a duck-side INSERT into this table failed "
                            "(oracle translation gap, error recorded) "
                            "— the duck fixture is incomplete; selects "
                            "over it are unverified here, not "
                            "divergent"
                        )
                    else:
                        cls, evidence = _classify_fixture_divergence(
                            sp, du, t in tie_tables
                        )
                        if cls == "tie_limit_subset":
                            adjudication = (
                                "built (transitively) through a LIMIT "
                                "under a non-total order — both "
                                "engines hold a legitimate but "
                                "different row subset"
                            )
                        else:
                            adjudication = FIXTURE_ADJUDICATIONS.get(
                                (rec["file"], t)
                            )
                            if adjudication is None and rec[
                                "file"
                            ].startswith("encryption_"):
                                # family rule: the encryption corpus
                                # loads kv1.txt via LOAD DATA INPATH,
                                # which the duck prelude cannot model
                                # — its copy stays empty; unverified
                                # here, not divergent (encryption
                                # zones out of scope per SURVEY §2.2)
                                adjudication = FIXTURE_ADJUDICATIONS[
                                    (
                                        "encryption_select_read_only_"
                                        "encrypted_tbl",
                                        "encrypted_table",
                                    )
                                ]
                            if adjudication is None and \
                                    cls == "collation":
                                adjudication = (
                                    "rendering-only (machine-checked): "
                                    "the row multisets are EQUAL under "
                                    "per-cell token normalization — "
                                    "CHAR pad/decimal scale/timestamp "
                                    "fraction spellings differ between "
                                    "the engines, the digits do not"
                                )
                    fixture_divergent.append(
                        {"file": rec["file"], "table": t,
                         "class": cls, "evidence": evidence,
                         "adjudication": adjudication}
                    )
            return ck[t]

        if rec["preludes_used"]:
            # defensive: a crashed prior run may have left created
            # tables behind in the shared warehouse
            for t in rec["created"]:
                for stmt in (f"drop table if exists {t}",
                             f"drop view if exists {t}"):
                    try:
                        eng.sql(stmt).collect()
                    except Exception:
                        pass
                for stmt in (f"DROP TABLE IF EXISTS {t}",
                             f"DROP VIEW IF EXISTS {t}"):
                    try:
                        con.execute(stmt)
                    except Exception:
                        pass
        gby_alias_on = False
        for kind, s in rec["stmts"]:
            mset = re.match(
                r"(?is)^set\s+hive\.groupby\.orderby\.position\.alias"
                r"\s*=\s*(\w+)", s,
            )
            if mset:
                gby_alias_on = mset.group(1).lower() == "true"
            # statements run IN FILE ORDER — a select between a create
            # and the end-of-file drop sees the table live
            if kind == "select":
                # a select over a created relation only compares when
                # the two engines' FIXTURES agree — a tie-broken LIMIT
                # subset or an untranslatable insert would otherwise
                # surface as a fake value mismatch (parity checked
                # lazily per exec-epoch; divergences are reported)
                tabs = _stmt_tables(s) & created_set
                if (not broken) and tabs and not all(
                    _fixture_ok(t) for t in tabs
                ):
                    counts["fixture_skip"] = (
                        counts.get("fixture_skip", 0) + 1
                    )
                    continue
                # with position alias OFF (the Hive 2.3 default) bare
                # GROUP BY integers are CONSTANTS in both Hive and the
                # engine — DuckDB reads them as ordinals, so the duck
                # side gets the same constant spelling the engine uses
                duck_stmt = s
                if not gby_alias_on and re.search(
                    r"\bGROUP\s+BY\s+\d", s, re.IGNORECASE
                ):
                    duck_stmt = (
                        _rewrite_groupby_ordinal_constants(s) or s
                    )
                if eng.macros:
                    # macro calls expand to their bodies for the duck
                    # side (engine expands internally in eng.sql)
                    duck_stmt = eng._expand_macros(duck_stmt)
                if re.search(
                    r"(?is)\bas\s+boolean\s*\)", duck_stmt
                ):
                    # Hive's getBoolean conversions, same text both
                    # sides (duck_translate truncates the (int) cast)
                    duck_stmt = eng._rewrite_boolean_casts(duck_stmt)
                if re.search(r"\bhash\s*\(", duck_stmt, re.IGNORECASE):
                    # the engine runs its own typed hash() rewrite
                    # inside eng.sql; the duck side needs the SAME
                    # expansion text (the __hive_hash_* fns are
                    # registered python UDFs here)
                    duck_stmt = eng._rewrite_hive_hash(duck_stmt)
                    if re.search(
                        r"(?<![\w_])hash\s*\(", duck_stmt, re.IGNORECASE
                    ):
                        # an arg the typed rewrite couldn't resolve —
                        # native-Murmur3 on the engine side, documented
                        counts["hash_native_skip"] = (
                            counts.get("hash_native_skip", 0) + 1
                        )
                        continue
                _run_select(
                    rec["file"], s, not broken, eng, con, counts,
                    mismatches, spark_errs, _norm, duck_errs,
                    duck_stmt=duck_stmt,
                )
                continue
            if broken:
                continue
            checked.clear()
            try:
                eng.sql(s).collect()
            except Exception as e:
                if _DROP_PRELUDE.match(s) or _DROP_VIEW_PRELUDE.match(s):
                    # defensive drops (DROP TABLE of a view, drop of an
                    # unreplayed recreate) are non-fatal in the goldens
                    continue
                from hive_2_3_2_spark.engine import (
                    HiveQLUnsupportedError,
                )

                counts["prelude_err"] += 1
                spark_errs.append(
                    {"file": rec["file"], "stmt": s[:200], "kind":
                     "prelude",
                     "err": " ".join(str(e).split())[:160],
                     "adjudication": SPARK_ERROR_ADJUDICATIONS.get(
                         rec["file"]
                     ) or (
                         _TYPED_GAP_ADJ
                         if isinstance(e, HiveQLUnsupportedError)
                         else None
                     )}
                )
                broken = True
                continue
            s_duck = s
            if re.search(r"\bhash\s*\(", s, re.IGNORECASE):
                # fixture INSERTs computing hash() (orc_merge10's
                # pmod(hash(key),2) partition column) build the duck
                # copy from the engine's typed expansion
                s_duck = eng._rewrite_hive_hash(s)
            for ds in duck_exec_statements(s_duck):
                try:
                    con.execute(ds)
                except Exception as de:
                    # retry with the lenient coercion pass (Hive's
                    # implicit insert/aggregate conversions spelled
                    # out) before declaring the duck build broken
                    try:
                        con.execute(duck_lenient(ds))
                        continue
                    except Exception:
                        pass
                    # the select over this table will surface as
                    # duck_err/fixture class — the engine side still
                    # ran; remember WHICH table's duck build broke so
                    # the divergence classifies as duck_prelude_err
                    dt = re.match(
                        r'(?is)^\s*insert\s+into\s+["`]?(\w+)["`]?', ds
                    )
                    if dt:
                        duck_failed.setdefault(
                            dt.group(1).lower(),
                            " ".join(str(de).split())[:160],
                        )
        if any(k == "exec" and s.lower().lstrip().startswith("set ")
               for k, s in rec["stmts"]):
            for reset in (
                "set hive.support.quoted.identifiers=column",
                "set hive.groupby.orderby.position.alias=false",
            ):
                try:
                    eng.sql(reset).collect()
                except Exception:
                    pass
        for t in rec["created"]:
            for stmt in (f"drop table if exists {t}",
                         f"drop view if exists {t}"):
                try:
                    eng.sql(stmt).collect()
                except Exception:
                    pass
            for stmt in (f'DROP TABLE IF EXISTS "{t}"',
                         f'DROP VIEW IF EXISTS "{t}"'):
                try:
                    con.execute(stmt)
                except Exception:
                    pass
    # a table re-checked across exec epochs can diverge repeatedly —
    # keep one record per (file, table, class), preferring the first
    seen_div: set[tuple] = set()
    fixture_divergent = [
        d for d in fixture_divergent
        if (k := (d["file"], d["table"], d["class"])) not in seen_div
        and not seen_div.add(k)
    ]
    result = {
        "total_statements": sum(
            1 for r in recs for k, _s in r["stmts"] if k == "select"
        ),
        "counts": counts,
        "mismatches": mismatches,
        "spark_errors": spark_errs[:40],
        "duck_errors": duck_errs,
        "fixture_divergent": fixture_divergent,
    }
    json.dump(result, open(args.out, "w"), indent=1)
    print(json.dumps({"total": result["total_statements"], **counts}))
    for m in mismatches[:25]:
        print("MISMATCH", m["file"], m["stmt"][:120].replace("\n", " "))
    spark.stop()


def _run_select(
    name, s, runnable, eng, con, counts, mismatches, spark_errs, _norm,
    duck_errs=None, duck_stmt=None,
) -> None:
    if not runnable:
        counts["prelude_skip"] += 1
        return
    try:
        df = eng.sql(s)
        sp_rows = df.collect()
        sp_cols = df.columns
    except Exception as e:
        from hive_2_3_2_spark.engine import HiveQLUnsupportedError

        counts["spark_err"] += 1
        spark_errs.append(
            {"file": name, "stmt": s[:200],
             "err": " ".join(str(e).split())[:160],
             "adjudication": SPARK_ERROR_ADJUDICATIONS.get(name) or (
                 _TYPED_GAP_ADJ
                 if isinstance(e, HiveQLUnsupportedError) else None
             )}
        )
        return
    translated = False
    ds = duck_stmt if duck_stmt is not None else s
    try:
        if re.search(r"\[\d+\]", ds):
            # integer subscripts are 0-based in Hive, 1-based in DuckDB
            # — raw would "succeed" with silently shifted elements
            raise ValueError("subscript-bearing: translate first")
        rel = con.execute(ds)
        du_rows = rel.fetchall()
        du_cols = [d[0] for d in rel.description]
    except Exception:
        try:
            rel = con.execute(duck_translate(ds))
            du_rows = rel.fetchall()
            du_cols = [d[0] for d in rel.description]
            translated = True
        except Exception:
            try:
                # lenient pass: Hive's implicit coercions spelled out
                rel = con.execute(duck_lenient(duck_translate(ds)))
                du_rows = rel.fetchall()
                du_cols = [d[0] for d in rel.description]
                translated = True
            except Exception as e:
                counts["duck_err"] += 1
                if duck_errs is not None:
                    duck_errs.append(
                        {"file": name, "stmt": ds[:200],
                         "err": " ".join(str(e).split())[:160],
                         "status": _duck_status(ds)}
                    )
                return
    # the SAME SQL text runs on both engines, so columns align by
    # POSITION — positional canonicalization sidesteps the
    # unaliased-expression naming differences between engines
    try:
        sp_canon = sorted(
            (tuple(_norm(v) for v in row) for row in sp_rows),
            key=repr,
        )
        du_canon = sorted(
            (tuple(_norm(_duckmap(v)) for v in row) for row in du_rows),
            key=repr,
        )
    except Exception:
        counts["duck_err"] += 1
        return
    lim = re.search(r"\blimit\s+(\d+)\s*(?:,\s*(\d+))?\s*$", s,
                    re.IGNORECASE)
    if sp_canon == du_canon:
        counts["match_translated" if translated else "match"] += 1
    elif lim and len(sp_canon) == int(lim.group(2) or lim.group(1)):
        # the LIMIT binds and the ORDER BY evidently is not total
        # (equal prefixes would have matched): a tie-broken subset,
        # not a value bug
        counts["tie_limit_skip"] = counts.get("tie_limit_skip", 0) + 1
    else:
        counts["mismatch_translated" if translated else "mismatch"] += 1
        import collections as _c

        sp_c = _c.Counter(map(tuple, sp_canon))
        du_c = _c.Counter(map(tuple, du_canon))
        sp_only = list((sp_c - du_c).elements())
        du_only = list((du_c - sp_c).elements())
        mismatches.append(
            {"file": name, "stmt": s[:300],
             "translated": translated,
             "spark_rows": len(sp_canon), "duck_rows": len(du_canon),
             "first_spark_only":
                 repr(sp_only[0])[:2000] if sp_only else None,
             "first_duck_only":
                 repr(du_only[0])[:2000] if du_only else None,
             "adjudication": MISMATCH_ADJUDICATIONS.get(name)}
        )


if __name__ == "__main__":
    main()
