"""Import-graph extraction: per-language regex semantics, normalization,
ownership resolution, the shuffle-free / broadcast plan shapes, and the
normalized-code dedup key."""

import pytest

from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.operators.codegraph import (
    dedup_normalized_code,
    extract_import_edges,
    normalize_code,
    repo_dependency_edges,
)

PY_SRC = (
    "import alpha.core\n"
    "  from beta_util import thing\n"
    "# import shadow_mod\n"
    "import gamma, delta\n"
    "from . import relative\n"
    "value = 1\n"
)

C_SRC = (
    "#include <libfoo/api.h>\n"
    '  # include "bar.hpp"\n'
    "// #include <shadow.h>\n"
    "int main() { return 0; }\n"
)

JS_SRC = (
    "const a = require('mod-one');\n"
    'const b = require( "mod-two" );\n'
    "import core from './local/mod';\n"
    "import 'side-effect';\n"
    "// import fake from 'shadow'\n"
    "let x = 1;\n"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "repo string, path string, lang string, content string")


def _modules(spark, lang, content):
    df = _docs(spark, [("r", "p", lang, content)])
    return sorted(
        r["module"] for r in extract_import_edges(df).collect()
    )


class TestExtraction:
    def test_python_patterns(self, spark):
        mods = _modules(spark, "py", PY_SRC)
        # 'import gamma, delta' captures only gamma (documented lexical
        # limit); commented and relative imports never match.
        assert mods == ["alpha.core", "beta_util", "gamma"]

    def test_c_patterns_strip_extension(self, spark):
        mods = _modules(spark, "c", C_SRC)
        assert mods == ["bar", "libfoo/api"]

    def test_js_patterns(self, spark):
        mods = _modules(spark, "js", JS_SRC)
        # ./ prefix stripped; anchored import-from skips the commented line.
        assert mods == ["local/mod", "mod-one", "mod-two", "side-effect"]

    def test_unknown_lang_and_importless_docs_drop(self, spark):
        df = _docs(
            spark,
            [
                ("r", "a", "en", "import alpha\n"),
                ("r", "b", "py", "value = 1\n"),
            ],
        )
        assert extract_import_edges(df).count() == 0

    def test_occurrences_kept(self, spark):
        df = _docs(spark, [("r", "p", "js", "require('m');\nrequire('m');\n")])
        assert extract_import_edges(df).count() == 2

    def test_extraction_plan_is_shuffle_free(self, spark):
        df = _docs(spark, [("r", "p", "py", "import alpha\n")])
        plan = extract_import_edges(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestDependencyEdges:
    def _fixture(self, spark):
        imports = _docs(
            spark,
            [
                ("repo-a", "x.py", "py", "import m1\nimport m1\nimport m2\nimport m_self\nimport unknown\n"),
                ("repo-b", "y.py", "py", "import m1\n"),
            ],
        )
        owners = spark.createDataFrame(
            [("m1", "repo-c"), ("m2", "repo-d"), ("m_self", "repo-a")],
            "module string, repo string",
        )
        return extract_import_edges(imports), owners

    def test_edges_counts_self_and_unresolved(self, spark):
        imp, owners = self._fixture(spark)
        rows = {
            (r["src_repo"], r["dst_repo"]): (r["n_links"], r["n_modules"])
            for r in repo_dependency_edges(imp, owners).collect()
        }
        # self-edge (repo-a -> repo-a via m_self) and unresolved 'unknown'
        # are both dropped; duplicate occurrences count in n_links once
        # each but n_modules is distinct.
        assert rows == {
            ("repo-a", "repo-c"): (2, 1),
            ("repo-a", "repo-d"): (1, 1),
            ("repo-b", "repo-c"): (1, 1),
        }

    def test_owners_broadcast_plan(self, spark):
        imp, owners = self._fixture(spark)
        plan = (
            repo_dependency_edges(imp, owners)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        # broadcast_owners=False merely removes the hint; on tiny local
        # stats the planner may still pick broadcast, so only equality of
        # results is asserted for that path.
        a = {tuple(r) for r in repo_dependency_edges(imp, owners).collect()}
        b = {
            tuple(r)
            for r in repo_dependency_edges(
                imp, owners, broadcast_owners=False
            ).collect()
        }
        assert a == b


class TestNormalizeCode:
    def _norm(self, spark, lang, content):
        df = spark.createDataFrame([(lang, content)], "lang string, content string")
        return df.select(
            normalize_code(F.col("content"), F.col("lang")).alias("n")
        ).collect()[0]["n"]

    def test_python_comments_and_ws(self, spark):
        src = "x = 1   # trailing\n# full line\n\n\ny  =\t2\n"
        assert self._norm(spark, "py", src) == "x = 1 y = 2"

    def test_c_line_and_block_comments(self, spark):
        src = "int a; // line\nint b; /* one\n   two */ int c;\n"
        assert self._norm(spark, "c", src) == "int a; int b; int c;"

    def test_js_block_comments_nongreedy(self, spark):
        # non-greedy: two blocks strip independently, code between survives
        src = "let a /* x */ = 1; /* y */ let b = 2;"
        assert self._norm(spark, "js", src) == "let a = 1; let b = 2;"

    def test_unknown_lang_passthrough_ws_only(self, spark):
        assert self._norm(spark, "en", "a  # not code\n b") == "a # not code b"

    def test_accepts_column_name_string(self, spark):
        df = spark.createDataFrame([("py", "a # c")], "lang string, content string")
        got = df.select(normalize_code(F.col("content"), "lang").alias("n"))
        assert got.collect()[0]["n"] == "a"

    def test_dedup_groups_only_differ_by_noise(self, spark):
        rows = [
            ("r1", "a.py", "py", "x = 1  # alpha\ny = 2\n"),
            ("r2", "b.py", "py", "x = 1\n# beta\ny  =  2"),   # clone modulo noise
            ("r1", "c.py", "py", "x = 3\n"),                   # different code
            ("r1", "d.c",  "c",  "x = 1\ny = 2 // c lang\n"),  # same text, other lang
        ]
        df = spark.createDataFrame(rows, "repo string, path string, lang string, content string")
        out = {
            (r["lang"], r["rep_repo"], r["rep_path"]): (r["n_files"], r["n_repos"])
            for r in dedup_normalized_code(df).collect()
        }
        # min-struct representative: ('r1','a.py') < ('r2','b.py')
        assert out[("py", "r1", "a.py")] == (2, 2)
        assert out[("py", "r1", "c.py")] == (1, 1)
        assert out[("c", "r1", "d.c")] == (1, 1)

    def test_dedup_plan_no_window(self, spark):
        df = spark.createDataFrame(
            [("r", "p", "py", "x = 1")],
            "repo string, path string, lang string, content string",
        )
        plan = (
            dedup_normalized_code(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # degenerate-class-proof shape: map-side partial_min before any
        # exchange (min over a struct plans as SortAggregate — structs are
        # not hash-aggregable — but it is still algebraic/partial), and
        # never a single-reducer Window over the clone class
        assert "Window" not in plan and "partial_min" in plan


class TestOwnersFromPaths:
    def _owners(self, spark, rows):
        from military_entity_extraction_based_on_large_models_spark.operators.codegraph import (
            owners_from_paths,
        )

        df = spark.createDataFrame(rows, "repo string, path string, lang string")
        return {
            (r["module"], r["repo"]) for r in owners_from_paths(df).collect()
        }

    def test_module_derivation_per_lang(self, spark):
        got = self._owners(
            spark,
            [
                ("ra", "src/pkg/mod.py", "py"),
                ("ra", "pkg/__init__.py", "py"),
                ("rb", "include/foo/api.h", "c"),
                ("rb", "./lib/util.hpp", "c"),
                ("rc", "a/b/mod.js", "js"),
                ("rc", "notes/readme.md", "en"),  # unknown lang drops
            ],
        )
        assert got == {
            ("pkg.mod", "ra"),
            ("pkg", "ra"),
            ("foo/api", "rb"),
            ("util", "rb"),
            ("a/b/mod", "rc"),
        }

    def test_end_to_end_without_external_owners(self, spark):
        """corpus → owners_from_paths → extract → edges, no external input:
        repo-b's file imports the module repo-a's path defines."""
        from military_entity_extraction_based_on_large_models_spark.operators.codegraph import (
            owners_from_paths,
        )

        docs = _docs(
            spark,
            [
                ("repo-a", "src/pkg/core.py", "py", "value = 1\n"),
                ("repo-b", "src/app.py", "py", "import pkg.core\n"),
            ],
        )
        owners = owners_from_paths(docs.select("repo", "path", "lang"))
        edges = {
            (r["src_repo"], r["dst_repo"], r["n_links"])
            for r in repo_dependency_edges(
                extract_import_edges(docs), owners
            ).collect()
        }
        assert edges == {("repo-b", "repo-a", 1)}

    def test_duplicate_definitions_both_survive(self, spark):
        got = self._owners(
            spark,
            [("r1", "m.py", "py"), ("r2", "m.py", "py"), ("r1", "m.py", "py")],
        )
        assert got == {("m", "r1"), ("m", "r2")}


class TestCallEdges:
    """Function-def + call-site extraction → cross-repo call edges."""

    PY = (
        "def top(x):\n"
        "    return helper(x) + other_fn(1)\n"
        "  def indented(y):\n"
        "# def shadow_py(z):\n"
        "class Widget: pass\n"
    )
    C = (
        "int compute(int x) {\n"
        "  return helper(x);\n"
        "}\n"
        "// int shadow_c(int y) {\n"
    )
    JS = (
        "function render(x) { return helper(x); }\n"
        "const arrow_fn = (x) => x\n"
        "const not_arrow = 5\n"
        "// function shadow_js() {\n"
    )

    def _defs(self, spark, lang, content):
        from military_entity_extraction_based_on_large_models_spark.operators.codegraph import (
            extract_function_defs,
        )
        df = _docs(spark, [("r", "p", lang, content)])
        return sorted(r["func"] for r in extract_function_defs(df).collect())

    def test_py_defs_anchor_excludes_comments(self, spark):
        # commented 'def shadow_py' never matches; class captured too
        assert self._defs(spark, "py", self.PY) == [
            "Widget", "indented", "top",
        ]

    def test_c_defs(self, spark):
        assert self._defs(spark, "c", self.C) == ["compute"]

    def test_js_defs_function_and_arrow_const(self, spark):
        # 'const not_arrow = 5' is not an arrow def; commented fn excluded
        assert self._defs(spark, "js", self.JS) == ["arrow_fn", "render"]

    def test_def_extraction_plan_is_shuffle_free(self, spark):
        from military_entity_extraction_based_on_large_models_spark.operators.codegraph import (
            extract_function_defs,
        )
        df = _docs(spark, [("r", "p", "py", self.PY)])
        plan = (
            extract_function_defs(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan

    def test_cross_repo_call_edges(self, spark):
        from military_entity_extraction_based_on_large_models_spark.operators.codegraph import (
            cross_repo_call_edges,
            extract_call_sites,
            extract_function_defs,
        )
        docs = _docs(
            spark,
            [
                # repo-a defines helper; repo-b calls it twice in one file
                ("repo-a", "lib.py", "py", "def helper(x):\n    return x\n"),
                (
                    "repo-b", "app.py", "py",
                    "def main(y):\n    return helper(y) + helper(0) + ghost(1)\n",
                ),
            ],
        )
        calls = extract_call_sites(docs)
        defs = extract_function_defs(docs)
        # call-site superset includes the definition lines themselves
        assert sorted(r["func"] for r in calls.collect()) == [
            "ghost", "helper", "helper", "helper", "main",
        ]
        edges = {
            (r["src_repo"], r["dst_repo"], r["func"], r["n_calls"])
            for r in cross_repo_call_edges(calls, defs).collect()
        }
        # own-repo resolutions (helper's def line, main's def line) and the
        # undefined ghost() call both drop; only the cross-repo edge stays
        assert edges == {("repo-b", "repo-a", "helper", 2)}

    def test_multi_owner_function_yields_edge_per_owner(self, spark):
        from military_entity_extraction_based_on_large_models_spark.operators.codegraph import (
            cross_repo_call_edges,
            extract_call_sites,
            extract_function_defs,
        )
        docs = _docs(
            spark,
            [
                ("r1", "a.py", "py", "def f(x):\n    return x\n"),
                ("r2", "b.py", "py", "def f(x):\n    return x\n"),
                ("r3", "c.py", "py", "v = f(1)\n"),
            ],
        )
        edges = {
            (r["src_repo"], r["dst_repo"], r["n_calls"])
            for r in cross_repo_call_edges(
                extract_call_sites(docs), extract_function_defs(docs)
            ).collect()
        }
        # candidate semantics: one edge per plausible owner; the defining
        # repos also cross-resolve to each other via their own def lines
        assert edges == {
            ("r3", "r1", 1), ("r3", "r2", 1),
            ("r1", "r2", 1), ("r2", "r1", 1),
        }

    def test_call_edges_plan_broadcasts_defs(self, spark):
        from military_entity_extraction_based_on_large_models_spark.operators.codegraph import (
            cross_repo_call_edges,
            extract_call_sites,
            extract_function_defs,
        )
        docs = _docs(spark, [("r", "p", "py", "def f(x):\n    return g(x)\n")])
        plan = (
            cross_repo_call_edges(
                extract_call_sites(docs), extract_function_defs(docs)
            )._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan


class TestInheritEdges:
    """Class-inheritance extraction + cross-repo type-dependency edges."""

    def _inh(self, spark, lang, content):
        from military_entity_extraction_based_on_large_models_spark.operators.codegraph import (
            extract_class_inherits,
        )
        df = _docs(spark, [("r", "p", lang, content)])
        return sorted(
            (r["child"], r["parent"])
            for r in extract_class_inherits(df).collect()
        )

    def test_py_inherits(self, spark):
        src = (
            "class Sub(Base):\n    pass\n"
            "  class Inner(pkg.Mixin):\n"
            "class Plain: pass\n"
            "# class Shadow(Nope):\n"
        )
        # Plain (no parent) yields no pair; dotted parent captured;
        # commented class excluded by the anchor
        assert self._inh(spark, "py", src) == [
            ("Inner", "pkg.Mixin"), ("Sub", "Base"),
        ]

    def test_py_multi_inheritance_captures_first(self, spark):
        assert self._inh(spark, "py", "class X(A, B):\n") == [("X", "A")]

    def test_js_extends(self, spark):
        src = (
            "class View extends Component {}\n"
            "class Standalone {}\n"
            "// class Shadow extends Nope {\n"
        )
        assert self._inh(spark, "js", src) == [("View", "Component")]

    def test_c_has_no_inheritance(self, spark):
        assert self._inh(spark, "c", "struct x { int a; };\n") == []

    def test_cross_repo_inherit_edges(self, spark):
        from military_entity_extraction_based_on_large_models_spark.operators.codegraph import (
            LANG_CLASS_DEF_PATTERNS,
            cross_repo_inherit_edges,
            extract_class_inherits,
            extract_function_defs,
        )
        docs = _docs(
            spark,
            [
                ("base-repo", "b.py", "py", "class Base: pass\n"),
                # subclasses Base (cross-repo) AND its own Local (dropped)
                (
                    "app-repo", "a.py", "py",
                    "class Local: pass\nclass S1(Base):\n    pass\n"
                    "class S2(Local):\n    pass\nclass S3(Ghost):\n    pass\n",
                ),
            ],
        )
        class_defs = extract_function_defs(
            docs, patterns=LANG_CLASS_DEF_PATTERNS
        )
        edges = {
            (r["src_repo"], r["dst_repo"], r["child"], r["parent"], r["n_inherits"])
            for r in cross_repo_inherit_edges(
                extract_class_inherits(docs), class_defs
            ).collect()
        }
        # own-repo (S2→Local) and undefined (S3→Ghost) both drop
        assert edges == {("app-repo", "base-repo", "S1", "Base", 1)}

    def test_inherit_extraction_plan_is_shuffle_free(self, spark):
        from military_entity_extraction_based_on_large_models_spark.operators.codegraph import (
            extract_class_inherits,
        )
        df = _docs(spark, [("r", "p", "py", "class A(B):\n")])
        plan = (
            extract_class_inherits(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
