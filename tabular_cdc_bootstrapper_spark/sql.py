"""SQL front-end for the engine's versioned tables — the maintenance
dialect a reference user speaks to their Iceberg catalog
(`/root/reference/batch-bootstrapper/tabular.py:8` — the reference's
tables are Iceberg, where DELETE/UPDATE/ALTER/OPTIMIZE/VACUUM/MERGE all
arrive as SQL), re-targeted at this engine's table classes. Spark's own
SQL parser cannot address ``VersionedBucketMirror``/``ParquetStateTable``
(they are not catalog tables), so :class:`TableSql` parses the statement
HEAD — the verb and table clause — and delegates everything inside
expressions (conditions, assignments, sub-selects) to Spark's parser via
``F.expr``/``spark.sql``. No expression grammar is re-implemented here;
this is a dispatcher, not a SQL engine.

Supported statements (keywords case-insensitive)::

    DELETE FROM t WHERE <cond>
    UPDATE t SET a = <expr>, b = <expr> WHERE <cond>
    ALTER TABLE t RENAME COLUMN a TO b
    ALTER TABLE t DROP COLUMN a[, b ...]
    ALTER TABLE t ADD COLUMN a <spark-type>
    ALTER TABLE t ALTER COLUMN a TYPE <spark-type>
    OPTIMIZE t [ZORDER BY (a, b)]
    VACUUM t [RETAIN <n> VERSIONS]
    RESTORE TABLE t TO VERSION AS OF <n>
    MERGE INTO t USING (<select>) ON k1[, k2 ...]
        [WHEN MATCHED [AND <cond>] THEN UPDATE SET a = <expr>, ...]
        [WHEN MATCHED [AND <cond>] THEN DELETE]
        [WHEN NOT MATCHED [AND <cond>] THEN INSERT *]
    SELECT ... FROM t [VERSION AS OF <n> | TIMESTAMP AS OF <ts>] ...

In MERGE expressions, source columns are referenced as ``src.col``
(target columns by plain name) — the ``operators/merge.py src()``
convention surfaced as SQL. SELECT statements may reference any number
of registered tables; each reference (with optional time travel) is
resolved to a snapshot read and substituted as a temp view before the
statement is handed to ``spark.sql`` whole.

DML/maintenance statements return the engine's receipt dict; SELECT
returns a DataFrame.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _split_top_level(s: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` outside parentheses and string literals."""
    parts, depth, buf, i = [], 0, [], 0
    while i < len(s):
        c = s[i]
        if c == "'":
            j = i + 1
            while j < len(s):
                if s[j] == "'" and not (j + 1 < len(s) and s[j + 1] == "'"):
                    break
                j += 2 if s[j] == "'" else 1
            buf.append(s[i : j + 1])
            i = j + 1
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        if c == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(c)
        i += 1
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


_SRC_REF = re.compile(r"\bsrc\.([A-Za-z_][A-Za-z0-9_]*)")


def _merge_expr(text: str):
    """A MERGE expression with ``src.col`` references folded to the
    internal source prefix (operators/merge.py ``src()``)."""
    return F.expr(_SRC_REF.sub(r"__s_\1", text))


class TableSql:
    """Dispatch table-maintenance SQL onto registered table handles."""

    def __init__(self, spark: SparkSession, tables: dict | None = None):
        self.spark = spark
        self._tables: dict[str, object] = {}
        for name, t in (tables or {}).items():
            self.register(name, t)

    def register(self, name: str, table) -> "TableSql":
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise ValueError(f"invalid table name {name!r}")
        self._tables[name.lower()] = table
        return self

    def _table(self, name: str):
        t = self._tables.get(name.lower())
        if t is None:
            raise ValueError(
                f"unknown table {name!r} — registered: "
                f"{sorted(self._tables)}"
            )
        return t

    # -- dispatcher ---------------------------------------------------------
    def sql(self, statement: str):
        s = statement.strip().rstrip(";").strip()
        head = s.split(None, 1)[0].upper() if s else ""
        if head == "DELETE":
            return self._delete(s)
        if head == "UPDATE":
            return self._update(s)
        if head == "ALTER":
            return self._alter(s)
        if head == "OPTIMIZE":
            return self._optimize(s)
        if head == "VACUUM":
            return self._vacuum(s)
        if head == "RESTORE":
            return self._restore(s)
        if head == "MERGE":
            return self._merge(s)
        if head in ("SELECT", "WITH"):
            return self._select(s)
        raise ValueError(
            f"unsupported statement {head!r} — supported: DELETE, UPDATE, "
            "ALTER TABLE, OPTIMIZE, VACUUM, RESTORE, MERGE, SELECT/WITH"
        )

    # -- row-level DML ------------------------------------------------------
    def _delete(self, s: str) -> dict:
        m = re.match(
            r"DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+)$", s, re.I | re.S
        )
        if not m:
            raise ValueError(
                "expected: DELETE FROM <table> WHERE <condition> "
                "(an unconditional DELETE is a table drop — not offered)"
            )
        return self._table(m.group(1)).delete_where(self.spark, m.group(2))

    def _update(self, s: str) -> dict:
        m = re.match(
            r"UPDATE\s+(\w+)\s+SET\s+(.+?)\s+WHERE\s+(.+)$", s, re.I | re.S
        )
        if not m:
            raise ValueError(
                "expected: UPDATE <table> SET a = <expr>[, ...] "
                "WHERE <condition>"
            )
        assignments = {}
        for part in _split_top_level(m.group(2)):
            am = re.match(r"(\w+)\s*=\s*(.+)$", part, re.S)
            if not am:
                raise ValueError(f"bad SET clause {part!r}")
            assignments[am.group(1)] = am.group(2)
        return self._table(m.group(1)).update_where(
            self.spark, m.group(3), assignments
        )

    # -- DDL ----------------------------------------------------------------
    def _alter(self, s: str) -> dict:
        pats = [
            (
                r"ALTER\s+TABLE\s+(\w+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+"
                r"CHECK\s*\((.+)\)$",
                lambda t, n, e: self._table(t).add_constraint(
                    self.spark, n, e
                ),
            ),
            (
                r"ALTER\s+TABLE\s+(\w+)\s+DROP\s+CONSTRAINT\s+(\w+)$",
                lambda t, n: self._table(t).drop_constraint(n),
            ),
            (
                r"ALTER\s+TABLE\s+(\w+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)$",
                lambda t, a, b: self._alter_call(t, rename={a: b}),
            ),
            (
                r"ALTER\s+TABLE\s+(\w+)\s+DROP\s+COLUMNS?\s+(.+)$",
                lambda t, cols: self._alter_call(
                    t, drop=[c.strip() for c in cols.split(",")]
                ),
            ),
            (
                r"ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMNS?\s+(\w+)\s+([\w()<>, ]+)$",
                lambda t, c, ty: self._alter_call(t, add={c: ty.strip()}),
            ),
            (
                r"ALTER\s+TABLE\s+(\w+)\s+ALTER\s+COLUMN\s+(\w+)\s+TYPE\s+([\w()<>, ]+)$",
                lambda t, c, ty: self._alter_call(t, widen={c: ty.strip()}),
            ),
        ]
        for pat, fn in pats:
            m = re.match(pat, s, re.I)
            if m:
                return fn(*m.groups())
        raise ValueError(
            "expected one of: ALTER TABLE t RENAME COLUMN a TO b | "
            "DROP COLUMN a[, b] | ADD COLUMN a <type> | "
            "ALTER COLUMN a TYPE <type> | "
            "ADD CONSTRAINT n CHECK (expr) | DROP CONSTRAINT n"
        )

    def _alter_call(self, name: str, **kwargs) -> dict:
        t = self._table(name)
        try:
            return t.alter_schema(**kwargs)
        except TypeError:
            # ParquetStateTable's first alter may need spark= to bind
            # the current parquet schema
            return t.alter_schema(spark=self.spark, **kwargs)
        except ValueError as e:
            if "needs spark=" in str(e):
                return t.alter_schema(spark=self.spark, **kwargs)
            raise

    # -- maintenance --------------------------------------------------------
    def _optimize(self, s: str) -> dict:
        m = re.match(
            r"OPTIMIZE\s+(\w+)"
            r"(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?$",
            s,
            re.I,
        )
        if not m:
            raise ValueError("expected: OPTIMIZE <table> [ZORDER BY (a, b)]")
        t = self._table(m.group(1))
        z = (
            [c.strip() for c in m.group(2).split(",")]
            if m.group(2)
            else ()
        )
        return t.rewrite_data_files(
            self.spark, min_files=1, materialize=True, zorder_cols=z
        )

    def _vacuum(self, s: str) -> dict:
        m = re.match(
            r"VACUUM\s+(\w+)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?$", s, re.I
        )
        if not m:
            raise ValueError("expected: VACUUM <table> [RETAIN n VERSIONS]")
        keep = int(m.group(2)) if m.group(2) else None
        return self._table(m.group(1)).expire_snapshots(keep_last=keep)

    def _restore(self, s: str) -> dict:
        m = re.match(
            r"RESTORE\s+TABLE\s+(\w+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)$",
            s,
            re.I,
        )
        if not m:
            raise ValueError(
                "expected: RESTORE TABLE <table> TO VERSION AS OF <n>"
            )
        return self._table(m.group(1)).rollback(int(m.group(2)))

    # -- MERGE ---------------------------------------------------------------
    def _merge(self, s: str) -> dict:
        from tabular_cdc_bootstrapper_spark.operators.merge import (
            merge_into_table,
        )

        hm = re.match(r"MERGE\s+INTO\s+(\w+)\s+USING\s+", s, re.I)
        if not hm:
            raise ValueError(
                "expected: MERGE INTO t USING (<select>)|<view> ON "
                "k1[, k2] WHEN ..."
            )
        name = hm.group(1)
        rest = s[hm.end() :]
        if rest.startswith("("):  # balanced-paren subquery (may nest)
            depth, j = 0, 0
            for j, c in enumerate(rest):
                if c == "(":
                    depth += 1
                elif c == ")":
                    depth -= 1
                    if depth == 0:
                        break
            if depth != 0:
                raise ValueError("unbalanced parentheses in MERGE USING")
            using, rest = rest[: j + 1], rest[j + 1 :]
        else:
            vm = re.match(r"(\w+)", rest)
            if not vm:
                raise ValueError("expected a subquery or view after USING")
            using, rest = vm.group(1), rest[vm.end() :]
        tm = re.match(
            r"\s+ON\s+([\w\s,]+?)\s*(WHEN\s+.*)$", rest, re.I | re.S
        )
        if not tm:
            raise ValueError(
                "expected: ... ON k1[, k2] WHEN ... after MERGE USING"
            )
        on_cols, when_block = tm.groups()
        source = (
            self._select(using[1:-1].strip())
            if using.startswith("(")
            else self.spark.table(using)
        )
        on = [c.strip() for c in on_cols.split(",")]
        kwargs: dict = {}
        for clause in re.split(r"(?i)\bWHEN\b", when_block)[1:]:
            cm = re.match(
                r"\s*(NOT\s+MATCHED|MATCHED)"
                r"(?:\s+AND\s+(.+?))?\s+THEN\s+(.+?)\s*$",
                clause,
                re.I | re.S,
            )
            if not cm:
                raise ValueError(f"bad WHEN clause: WHEN{clause!r}")
            matched, cond, action = cm.groups()
            is_matched = matched.upper() == "MATCHED"
            action_head = action.split(None, 1)[0].upper()
            if is_matched and action_head == "UPDATE":
                am = re.match(r"UPDATE\s+SET\s+(.+)$", action, re.I | re.S)
                if not am:
                    raise ValueError(f"bad MERGE action {action!r}")
                upd = {}
                for part in _split_top_level(am.group(1)):
                    pm = re.match(r"(\w+)\s*=\s*(.+)$", part, re.S)
                    if not pm:
                        raise ValueError(f"bad SET clause {part!r}")
                    upd[pm.group(1)] = _merge_expr(pm.group(2))
                kwargs["update_set"] = upd
                if cond:
                    kwargs["update_cond"] = _merge_expr(cond)
            elif is_matched and action_head == "DELETE":
                kwargs["delete_cond"] = (
                    _merge_expr(cond) if cond else F.lit(True)
                )
            elif not is_matched and action_head == "INSERT":
                im = re.match(r"INSERT\s+(\*.*)$", action, re.I | re.S)
                if not im or im.group(1).strip() != "*":
                    raise ValueError(
                        "only INSERT * is supported (source columns map "
                        "by name)"
                    )
                if cond:
                    kwargs["insert_cond"] = _merge_expr(cond)
            else:
                raise ValueError(f"bad MERGE action {action!r}")
        if "update_set" not in kwargs and "delete_cond" not in kwargs:
            kwargs["update_set"] = {}
        when_clauses = re.findall(r"(?i)\bWHEN\s+NOT\s+MATCHED\b", when_block)
        if not when_clauses:
            # no NOT MATCHED clause: suppress inserts entirely. The
            # insert expressions still ANALYZE even though the branch is
            # dead, so map every target column to NULL — otherwise a
            # source carrying only the updated columns (the common
            # update-only MERGE) fails resolution on src.<other-cols>.
            kwargs["insert_cond"] = F.lit(False)
            tcols = self._table(name).read(self.spark).columns
            kwargs["insert_set"] = {c: F.lit(None) for c in tcols}
        return merge_into_table(
            self.spark, self._table(name), source, on=on, **kwargs
        )

    # -- SELECT (incl. time travel) ------------------------------------------
    _TT = (
        r"\b({names})\b"
        r"(?:\s+VERSION\s+AS\s+OF\s+(\d+)"
        r"|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?"
    )

    def _select(self, s: str) -> DataFrame:
        if not self._tables:
            return self.spark.sql(s)
        pat = re.compile(
            self._TT.format(
                names="|".join(re.escape(n) for n in self._tables)
            ),
            re.I,
        )

        views: dict[tuple, str] = {}

        def _sub(m: re.Match) -> str:
            name, ver, ts = m.group(1).lower(), m.group(2), m.group(3)
            key = (name, ver, ts)
            if key not in views:
                t = self._table(name)
                if ver is not None:
                    df = t.read_version(self.spark, int(ver))
                elif ts is not None:
                    import datetime as _dt

                    epoch = _dt.datetime.fromisoformat(ts).timestamp()
                    df = t.read_as_of(self.spark, epoch)
                else:
                    df = t.read(self.spark)
                if df is None:
                    raise ValueError(f"table {name!r} has no snapshot")
                view = f"__tsql_{name}_{uuid.uuid4().hex[:8]}"
                df.createOrReplaceTempView(view)
                views[key] = view
            return views[key]

        return self.spark.sql(pat.sub(_sub, s))
