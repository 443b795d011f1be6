"""Import-graph extraction: per-language regex semantics, normalization,
ownership resolution, and the shuffle-free / broadcast plan shapes."""

import pytest

from pyspark.sql import functions as F

from military_entity_extraction_based_on_large_models_spark.operators.codegraph import (
    extract_import_edges,
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
