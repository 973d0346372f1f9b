"""Dialect packs (operators/dialects.py): the Stack-trait hook
surface as data. Each pack must (a) drive the Spark engine and the
DuckDB oracle to identical rows from ONE definition, (b) genuinely
change behavior on the shared planted dims, and (c) be addable with
zero engine-code changes."""

import duckdb

from stakgraph_spark.operators import dialects as D


def _spark_rows(spark, name, pack):
    return sorted(
        tuple(r) for r in D.run_dialect_pack(spark, name, pack).collect()
    )


def _oracle_rows(packs):
    return sorted(tuple(r) for r in duckdb.sql(D.dialects_oracle_sql(packs)).fetchall())


def test_every_shipped_pack_matches_its_oracle(spark):
    got = []
    for name in sorted(D.DIALECT_PACKS):
        got.extend(_spark_rows(spark, name, D.DIALECT_PACKS[name]))
    assert sorted(got) == _oracle_rows(D.DIALECT_PACKS)


def test_packs_genuinely_differ_on_the_same_input(spark):
    out = {
        name: _spark_rows(spark, name, pack) for name, pack in D.DIALECT_PACKS.items()
    }

    def arm(name, kind):
        return {(r[2], r[3]) for r in out[name] if r[1] == kind}

    # request normalization: each pack rewrites a different template style
    assert arm("flaskish", "norm") != arm("expressish", "norm") != arm("nextish", "norm")
    # flaskish rewrites <id>, leaves {id}; nextish the reverse
    fl = dict(arm("flaskish", "norm"))
    nx = dict(arm("nextish", "norm"))
    assert fl["0"] == "/api/items/:param" and fl["2"] == "/api/items/{id}"
    assert nx["0"] == "/api/items/<id>" and nx["2"] == "/api/items/:param"
    # classify_test: same name, three different classifications
    assert arm("flaskish", "test") != arm("expressish", "test") != arm("nextish", "test")
    assert dict(arm("nextish", "test"))["0"] == "IntegrationTest"  # its default
    assert dict(arm("flaskish", "test"))["0"] == "UnitTest"        # ^unit_ rule
    # handler pick: first vs last registered route
    assert dict(arm("flaskish", "handler"))["GET /api/a"] == "conv_x#3"
    assert dict(arm("expressish", "handler"))["GET /api/a"] == "conv_y#1"
    # extraction rules: each pack extracts a different family
    assert arm("flaskish", "extract") == {("0", "AuthCore"), ("3", "AuthCore")}
    assert ("4", "calc") in arm("expressish", "extract")


def test_lib_manifest_differs_per_pack(spark):
    """get_libs as pack data (lib_query / is_lib_file hooks): each
    pack reads only its own manifest file; two packs sharing
    package.json with different line rules extract different
    libraries from the same planted rows."""
    out = {
        name: _spark_rows(spark, name, pack) for name, pack in D.DIALECT_PACKS.items()
    }

    def libs(name):
        return {r[3] for r in out[name] if r[1] == "lib"}

    assert libs("flaskish") == {"flask@2.3.0", "pydantic@1.10.12"}
    # same file, THREE different line rules: expressish's broad rule
    # takes caret/plain pins incl. the scoped dep, nextish tilde pins
    # only, angularish scoped (@org/name) deps only
    assert libs("expressish") == {
        "express@4.18.2",
        "next@13.4.0",
        "@angular/core@17.0.2",
    }
    assert libs("nextish") == {"next@13.4.0"}
    assert libs("angularish") == {"@angular/core@17.0.2"}
    assert libs("goish") == {"github.com/go-chi/chi@5.0.8"}
    assert libs("railsish") == {"rails@7.0.4"}
    # typescriptish's version predicate carries typescript.rs:30's
    # '*' alternation — the star-pinned dep is its alone — and its
    # capture is the WHOLE version string (typescript.rs:30 #match-es
    # the string node, specifier included), so the same rows that
    # give expressish bare versions give typescriptish ^/~ ones
    assert libs("typescriptish") == {
        "express@^4.18.2",
        "next@~13.4.0",
        "@angular/core@^17.0.2",
        "left-pad@*",
    }
    # rustish is toml.rs's SECTION-SCOPED query (toml.rs:26-50):
    # anyhow matches the string form, tokio the inline-table
    # `{ version = ... }` form; serde sits BEFORE the [dependencies]
    # header (no section yet) and criterion under [dev-dependencies],
    # so both are dropped — #eq? @section "dependencies" is strict
    assert libs("rustish") == {"anyhow@1.0.79", "tokio@1.35.0"}


def test_import_resolve_differs_per_pack(spark):
    """resolve_import_path / resolve_import_name as an op list: the
    same planted raw imports resolve differently per pack; a pack
    without the hook emits nothing (imports_query None analog); the
    flaskish empty op list is the trait's identity default."""
    out = {
        name: _spark_rows(spark, name, pack) for name, pack in D.DIALECT_PACKS.items()
    }

    def kind(name, k):
        return {r[2]: r[3] for r in out[name] if r[1] == k}

    fl, ex, nx, go = (
        kind("flaskish", "import"),
        kind("expressish", "import"),
        kind("nextish", "import"),
        kind("goish", "import"),
    )
    assert kind("railsish", "import") == {}  # no hook -> no rows
    assert fl["0"] == " ./components/App "   # identity default
    assert ex["0"] == "components/App"       # trim + strip './'
    assert nx["0"] == " ./components/App "   # strip_rel needs exact prefix
    assert nx["1"] == "abs/widgets"          # '/' arm
    assert ex["3"] == "quoted/mod" and go["3"] == "quoted/mod"
    assert fl["3"] == "'quoted/mod'"
    # name op: dotted tail for goish, identity for expressish
    assert kind("goish", "impname")["2"] == "List"
    assert kind("goish", "impname")["5"] == "D"
    assert kind("goish", "impname")["4"] == "plain_mod"
    assert kind("expressish", "impname")["2"] == "java.util.List"
    # typescriptish's ext_js_to_ts (typescript.rs:306-308): the '.js'
    # path retargets to '.ts', and Rust's replace-all swaps BOTH
    # occurrences; expressish strips the prefix but keeps '.js'
    ts = kind("typescriptish", "import")
    assert ts["6"] == "mod.ts/helpers.ts"
    assert kind("expressish", "import")["6"] == "mod.js/helpers.js"
    # a non-.js path passes the op untouched
    assert ts["3"] == "quoted/mod"


def test_clean_edges_and_assoc_name_per_pack(spark):
    """clean_graph (go.rs:301-303) and convert_association_to_name
    (ruby.rs:554-557) as pack data: different prune lists survive
    different planted edges; singular+pascal rules apply only where
    the pack carries the hook."""
    out = {
        name: _spark_rows(spark, name, pack) for name, pack in D.DIALECT_PACKS.items()
    }

    def kind(name, k):
        return {r[2]: r[3] for r in out[name] if r[1] == k}

    assert "0" not in kind("goish", "clean")          # OPERAND pruned
    assert "4" in kind("goish", "clean")              # RENDERS kept
    assert "0" in kind("nextish", "clean")            # OPERAND kept
    assert "4" not in kind("nextish", "clean")        # RENDERS pruned
    assert kind("flaskish", "clean") == {}            # no hook -> no arm
    assert kind("railsish", "assoc") == {
        "0": "CustomerOrder",   # 's' strip + pascal
        "1": "Company",         # 'ies' -> 'y'
        "2": "Status",          # 'us' pass-through rule beats 's' strip
        "3": "LineItem",        # already singular
    }
    assert kind("goish", "assoc") == {}               # trait default


def test_dots_to_path_op(spark):
    """The java.rs:237-245 dotted-name rewrite as an op — exercised
    via a throwaway pack since no shipped pack uses it."""
    pack = {
        "rules": [],
        "request_styles": [],
        "test_classes": [],
        "default_test_class": "UnitTest",
        "handler_pick": "first",
        "import_resolve": {
            "path_ops": ["dots_to_path_drop_last"],
            "name_op": "last_dot_segment",
        },
    }
    rp, rn = D.resolve_import_sql(pack, "raw_import")
    rows = duckdb.sql(
        f"WITH ic AS ({D.import_cases_cte()})"
        f" SELECT case_id, {rp} AS p, {rn} AS n FROM ic"
    ).fetchall()
    got = {c: (p, n) for c, p, n in rows}
    assert got[2] == ("java/util", "List")
    assert got[5] == ("a/b/c", "D")
    assert got[4] == ("plain_mod", "plain_mod")


def test_new_pack_needs_no_code(spark):
    """A brand-new 'language' is a dict literal: the same fixed
    interpreters evaluate it engine-side and oracle-side with no
    code changes anywhere."""
    from stakgraph_spark.operators.extract import MENTION_RE

    new_pack = {
        "rules": [("mention", MENTION_RE, True)],
        "request_styles": ["brace"],                     # only {param}
        "test_classes": [("billing", "IntegrationTest")],
        "default_test_class": "E2etest",                 # unusual default
        "handler_pick": "last",
    }
    got = _spark_rows(spark, "novel", new_pack)
    assert got == _oracle_rows({"novel": new_pack})
    by_kind = {}
    for _p, kind, i, v in got:
        by_kind.setdefault(kind, {})[i] = v
    assert by_kind["norm"]["2"] == "/api/items/:param"   # {id} rewritten
    assert by_kind["norm"]["0"] == "/api/items/<id>"     # <id> untouched
    assert by_kind["test"]["1"] == "IntegrationTest"     # 'billing' rule
    assert by_kind["test"]["0"] == "E2etest"             # the new default
    assert by_kind["handler"]["GET /api/a"] == "conv_y#1"


def test_file_filter_stack_differs_per_pack(spark):
    """The should_not_include stack (operators/files.py) as pack
    data: the same planted paths flip per dialect, the reference's
    step ordering included (repo.rs:477-526)."""
    out = {
        name: _spark_rows(spark, name, pack) for name, pack in D.DIALECT_PACKS.items()
    }

    def files(name):
        return {r[2]: r[3] for r in out[name] if r[1] == "file"}

    fl, ex, nx, rs = files("flaskish"), files("expressish"), files("nextish"), files("railsish")
    # own-ext vs other-ext flip on the same file
    assert fl["src/app.py"] == "true" and ex["src/app.py"] == "false"
    # ordering quirk preserved: own extension (step 5) beats the
    # .min.js skip suffix (step 7) for expressish; nextish claims .js
    # as another language's ext and excludes it
    assert ex["web/app.min.js"] == "true" and nx["web/app.min.js"] == "false"
    # package manifests force-include only for the owning dialect
    assert fl["requirements.txt"] == "true" and ex["requirements.txt"] == "false"
    assert ex["package.json"] == "true" and fl["package.json"] == "false"
    # junk dirs
    assert fl["node_modules/leftpad/index.js"] == "false"
    assert fl["src/__pycache__/app.cpython.pyc"] == "false"
    # skip_file_ends reaches only unclaimed extensions
    assert fl["scripts/helper.sh"] == "false" and ex["scripts/helper.sh"] == "true"
    # allowlist short-circuit: junk_dirs ['src','docs'] present but
    # never consulted (repo.rs:481-483)
    assert rs == {
        p: ("true" if p in ("src/app.py", "docs/README.md") else "false")
        for p in rs
    }


def test_component_verb_testfile_hooks_per_pack(spark):
    """Round-4 widening: is_component (react.rs:170-175),
    add_endpoint_verb (rust.rs:301-330 / python.rs:220-257), and
    is_test_file (go.rs:285 / ruby.rs:253 / react.rs:852-866) as
    pack data. Packs consult different COLUMNS of the same planted
    verb rows; absent keys emit nothing (the trait defaults)."""
    out = {
        name: _spark_rows(spark, name, pack) for name, pack in D.DIALECT_PACKS.items()
    }

    def kind(name, k):
        return {r[2]: r[3] for r in out[name] if r[1] == k}

    # component: only the react-ish packs carry the hook
    assert kind("flaskish", "component") == {}
    assert kind("goish", "component") == {}
    ex = kind("expressish", "component")
    assert ex["0"] == "true" and ex["3"] == "true"      # App, NavBar
    assert ex["1"] == "false" and ex["2"] == "false"    # useItems, render_page
    assert ex["4"] == "false"                           # _private
    # verb: expressish reads only the call text; flaskish is the
    # python.rs:220-257 ladder — verb-named decorator call first,
    # then METHOD-name (tail after '.') handler tiers, GET fallback
    exv, flv = kind("expressish", "verb"), kind("flaskish", "verb")
    assert exv["2"] == "POST" and flv["2"] == "POST"    # both see router.post
    assert exv["3"] == "" and flv["3"] == "POST"        # no call vs create_order
    assert exv["5"] == "" and flv["5"] == "GET"         # app.route vs index
    assert exv["4"] == "DELETE" and flv["4"] == "DELETE"
    # the dotted handler strips to get_stats for flaskish only
    assert flv["13"] == "GET" and exv["13"] == ""
    # rustish (rust.rs:301-335): dotless call tiers, then handler
    # prefix tiers, NO fallthrough — the same app.route rows fall to
    # the handler (get_items -> GET) or to nothing ('index' has no
    # rust rule, where flaskish says GET and kotlinish defaults GET)
    rv = kind("rustish", "verb")
    assert rv["0"] == "GET" and rv["1"] == "GET"
    assert rv["3"] == "POST" and rv["5"] == ""
    assert rv["13"] == ""      # rust prefixes the FULL handler string
    assert kind("goish", "verb") == {}                  # trait no-op default
    # typescriptish (typescript.rs:186-213) carries kotlinish's four
    # call_method_eq rules but the '' default — an unmatched
    # registration leaves the verb UNSET where kotlinish says GET
    tsv, ktv = kind("typescriptish", "verb"), kind("kotlinish", "verb")
    assert tsv["0"] == "GET" and ktv["0"] == "GET"      # r.get(...)
    assert tsv["2"] == "POST" and tsv["4"] == "DELETE"
    assert tsv["1"] == "" and ktv["1"] == "GET"         # app.route(...)
    assert tsv["3"] == "" and ktv["3"] == "GET"         # no call at all
    # test_file: suffix families differ; '_' never wildcards
    assert kind("goish", "testfile")["pkg/auth_test.go"] == "true"
    assert kind("goish", "testfile")["src/main.go"] == "false"
    assert kind("railsish", "testfile")["spec/models/user_spec.rb"] == "true"
    # the same planted file flips between the two react-ish packs
    assert kind("expressish", "testfile")["src/__tests__/util.ts"] == "true"
    assert kind("nextish", "testfile")["src/__tests__/util.ts"] == "false"
    assert kind("expressish", "testfile")["src/app.test.tsx"] == "false"
    assert kind("nextish", "testfile")["src/app.test.tsx"] == "true"
    assert kind("flaskish", "testfile") == {}


def test_javaish_pack(spark):
    """The 6th shipped pack: the java.rs:228-245 dotted-import
    rewrites in the SHIPPED registry (not just a throwaway test
    pack), gradle-style manifest lines, FooTest/FooIT class naming."""
    out = _spark_rows(spark, "javaish", D.DIALECT_PACKS["javaish"])

    def kind(k):
        return {r[2]: r[3] for r in out if r[1] == k}

    assert kind("import")["2"] == "java/util"       # dots -> path, tail dropped
    assert kind("import")["5"] == "a/b/c"
    assert kind("impname")["2"] == "List"           # tail dot segment
    assert kind("lib") == {"10": "org.slf4j:slf4j-api@2.0.9"}  # ^implementation only
    assert kind("test")["6"] == "IntegrationTest"   # CartIT hits IT$
    assert kind("test")["0"] == "UnitTest"          # default
    assert kind("testfile")["src/OrderTest.java"] == "true"
    assert kind("testfile")["src/Main.java"] == "false"
    assert kind("norm")["2"] == "/api/items/:param"  # only {id} rewritten
    assert kind("norm")["0"] == "/api/items/<id>"


def test_dm_e2eid_router_hooks_per_pack(spark):
    """Round-4 widening, batch 2: data_model_path_filter
    (ruby.rs:218 / kotlin.rs:235), data_model_name (ruby.rs:187-189
    pluralize+lowercase), e2e_test_id_finder_string (ruby.rs:256),
    is_router_file (react.rs:599-604) as pack data."""
    out = {
        name: _spark_rows(spark, name, pack) for name, pack in D.DIALECT_PACKS.items()
    }

    def kind(name, k):
        return {r[2]: r[3] for r in out[name] if r[1] == k}

    # dm_path_filter: different substrings keep different survivors
    assert kind("railsish", "dmfile") == {"0": "db/schema.rb"}
    assert kind("nextish", "dmfile") == {
        "1": "app/models/user.rb",
        "2": "models/order.ts",
    }
    assert kind("flaskish", "dmfile") == {}          # trait None default
    # data_model_name: each pluralization rule fires once
    assert kind("railsish", "dmname") == {
        "0": "customers",   # catch-all +s
        "1": "companies",   # y -> ies
        "2": "statuses",    # us -> uses
        "3": "lineitems",   # +s, lowercased
        "4": "persons",     # catch-all +s (the pack's suffix rules
                            # are data, not a full inflection lib —
                            # 'people' would need an added rule)
    }
    assert kind("goish", "dmname") == {}             # identity default
    # e2e_test_id: snake vs camel finders claim disjoint call sites
    assert kind("railsish", "e2eid") == {"0": "cart", "2": "checkout-btn"}
    assert kind("expressish", "e2eid") == {"1": "nav", "3": "submit"}
    assert kind("goish", "e2eid") == {}
    # router_file: nextish's extra '.test.' exclusion flips one file
    assert kind("expressish", "router")["src/app.test.tsx"] == "true"
    assert kind("nextish", "router")["src/app.test.tsx"] == "false"
    assert kind("expressish", "router")["src/__tests__/util.ts"] == "false"
    assert kind("railsish", "router") == {}


def test_epfile_update_xpage_dmclass_hooks_per_pack(spark):
    """Round-4 widening, batch 3: endpoint_path_filter
    (ruby.rs:153-155), update_endpoint's three reference styles
    (java.rs:170-184 verb_map, cpp.rs:278-296 suffix_strip,
    react.rs:566-579 + 876-889 name_is_verb), is_extra_page
    (ruby.rs:503-515 / react.rs:743-790), class_contains_datamodel
    (ruby.rs:608-628) as pack data."""
    out = {
        name: _spark_rows(spark, name, pack) for name, pack in D.DIALECT_PACKS.items()
    }

    def kind(name, k):
        return {r[2]: r[3] for r in out[name] if r[1] == k}

    # endpoint_path_filter: different substrings, different survivors;
    # contains is case-sensitive (items_controller.rb must NOT match
    # javaish's 'Controller')
    assert kind("railsish", "epfile") == {"0": "config/routes.rb"}
    assert kind("javaish", "epfile") == {"2": "src/ItemController.java"}
    assert kind("goish", "epfile") == {}             # trait None default
    # update_endpoint — the same 8 planted endpoints, three styles:
    # verb_map maps the table exactly, unknown -> GET, and an
    # UN-annotated endpoint also gains GET (java.rs:186's trailing
    # add_verb — the hook never leaves a Java endpoint verbless)
    jv = kind("javaish", "update")
    assert jv["0"] == "createItem#POST" and jv["1"] == "listItems#GET"
    assert jv["2"] == "oddball#GET"                      # unknown annotation
    assert jv["5"] == "bare#GET" and jv["6"] == "GET#GET"  # absent -> GET
    # suffix_strip: strip _METHOD, trim quotes, uppercase; absent -> ANY
    cp = kind("cppish", "update")
    assert cp["3"] == "register#GET" and cp["4"] == "register2#POST"
    assert cp["5"] == "bare#ANY" and cp["6"] == "GET#ANY"
    # name_is_verb: the verb-named route.ts handler is renamed from
    # its file; handler meta = annotation or GET
    nx = kind("nextish", "update")
    assert nx["6"] == "/api/items#GET"               # renamed from file
    assert nx["7"] == "helper#POST" and nx["5"] == "bare#GET"
    assert kind("flaskish", "update") == {}          # trait no-op default
    # is_extra_page: views-dir templates vs app-router pages — the
    # same planted files flip per pack; ignore dirs prune
    assert kind("railsish", "xpage") == {
        "0": "app/views/users/index.html.erb",
        "1": "app/views/users/_form.haml",
    }
    assert kind("nextish", "xpage") == {"2": "src/app/items/page.tsx"}
    assert kind("goish", "xpage") == {}
    # class_contains_datamodel: railsish fans out {singular, plural} ×
    # {Controller, Blueprint} (Status protected from bare-s stripping);
    # flaskish joins identity-base × Blueprint only
    rl = {r[2:] for r in out["railsish"] if r[1] == "dmclass"}
    assert rl == {
        ("0", "CustomerController"),
        ("0", "CustomerBlueprint"),
        ("1", "CompaniesBlueprint"),
        ("2", "StatusController"),
    }
    assert {r[2:] for r in out["flaskish"] if r[1] == "dmclass"} == {
        ("0", "CustomerBlueprint")
    }


def test_pack_hooks_drive_the_real_corpus(spark, duck):
    """Dialect hooks over the REAL sf0.001 corpus, not planted dims:
    a pack whose classify_test rules differ from the build's tid%3
    and whose handler_pick direction is 'last' classifies the
    corpus's test definitions and picks request handlers
    engine-side, equal to the DuckDB oracle rendering of the SAME
    pack definition over the oracle's own transcripts derivation
    (sql/templates.py testdefs / requests CTEs)."""
    from stakgraph_spark.operators.extract import extract_requests, extract_test_defs
    from stakgraph_spark.sources.transcripts import read_transcripts
    from stakgraph_spark.sql import templates as T
    from tests.conftest import SF_SMALL

    pack = {
        "rules": [],
        "request_styles": ["colon"],
        "test_classes": [("[02468]$", "UnitTest"), ("[13]$", "IntegrationTest")],
        "default_test_class": "E2etest",
        "handler_pick": "last",
    }
    tr = read_transcripts(spark, SF_SMALL)
    name = "'test_' || tid"
    # classify_test over every real test-definition occurrence
    cls = (
        extract_test_defs(tr)
        .selectExpr(f"{D.classify_test_sql(pack, name, 'spark')} AS node_type")
        .groupBy("node_type")
        .count()
    )
    got_cls = {r["node_type"]: r["count"] for r in cls.collect()}
    want_cls = dict(
        duck.execute(
            T.q(
                f"SELECT {D.classify_test_sql(pack, name, 'duckdb')} AS node_type,"
                " count(*) AS n FROM testdefs GROUP BY 1"
            )
        ).fetchall()
    )
    assert got_cls == want_cls and set(got_cls) == {
        "UnitTest", "IntegrationTest", "E2etest",
    }
    # handler_pick over every real request occurrence — the 'last'
    # direction must pick different rows than the build's 'first'
    extract_requests(tr).selectExpr(
        "verb || ' ' || norm_path AS ep", "conv_id", "turn_idx"
    ).createOrReplaceTempView("hc")
    got_h = {
        (r.ep, r.conv_id, r.turn_idx)
        for r in spark.sql(D.handler_pick_sql(pack, "spark")).collect()
    }
    want_h = set(
        duck.execute(
            T.q(
                "SELECT * FROM ("
                + D.handler_pick_sql(pack, "duckdb").replace(
                    "FROM hc",
                    "FROM (SELECT verb || ' ' || norm_path AS ep, conv_id,"
                    " turn_idx FROM requests) hc",
                )
                + ")"
            )
        ).fetchall()
    )
    assert got_h == want_h and len(got_h) > 0
    first = {
        (r.ep, r.conv_id, r.turn_idx)
        for r in spark.sql(
            D.handler_pick_sql({"handler_pick": "first"}, "spark")
        ).collect()
    }
    assert first != got_h  # the direction genuinely flips real picks
    spark.catalog.dropTempView("hc")


def test_request_styles_drive_real_corpus_normalization(spark, duck):
    """request_styles — including the 'numseg' pseudo-style (a corpus
    that writes concrete numeric ids as its template-var form; the
    transcriptish dialect's own style, deliberately pack data rather
    than engine code) — drive extract_requests over the REAL sf
    corpus, equal to the DuckDB rendering of the SAME pack via
    normalize_request_sql."""
    from stakgraph_spark.operators.extract import extract_requests
    from stakgraph_spark.sources.transcripts import read_transcripts
    from stakgraph_spark.sql import templates as T
    from tests.conftest import SF_SMALL

    tr = read_transcripts(spark, SF_SMALL)

    def norms(pack):
        df = extract_requests(tr, pack).select("verb", "path", "norm_path")
        return {tuple(r) for r in df.collect()}

    # a pack WITHOUT numseg keeps concrete ids: the same corpus rows
    # normalize differently than the transcriptish default
    angle = {"request_styles": ["angle"]}
    got = norms(angle)
    assert got and got != norms(None)
    assert all("/:param" not in n for _v, _p, n in got)
    # differential: oracle renders the SAME pack over its own
    # requests derivation
    want = set(
        duck.execute(
            T.q(
                "SELECT verb, path,"
                f" {D.normalize_request_sql(angle, 'path', 'duckdb')} AS n"
                " FROM requests"
            )
        ).fetchall()
    )
    assert got == want
    # numseg spelled AS A STYLE reproduces the default chain exactly
    full = {
        "request_styles": [
            "numseg", "angle", "colon", "brace", "paren",
            "brace_opt", "catchall", "bracket",
        ]
    }
    assert norms(full) == norms(None)


def test_pack_parameterized_build(spark, duck):
    """The PRODUCTION build accepts a dialect pack
    (plans/pipeline.py build_graph(pack=...)): test classification
    and the HANDLER direction route through pack data (classify_test
    mod.rs:183 / handler_finder mod.rs:208-223 as data, live in the
    pipeline). A pack carrying the defaults is byte-identical to the
    packless build; an overriding pack changes ONLY the hooked
    families, each equal to the DuckDB oracle rendering of the same
    pack."""
    from pyspark.sql import functions as F

    from stakgraph_spark.plans.pipeline import build_graph
    from stakgraph_spark.sources.transcripts import read_transcripts
    from stakgraph_spark.sql import templates as T
    from tests.conftest import SF_SMALL

    pack = {
        "test_classes": [("[02468]$", "UnitTest"), ("[13]$", "IntegrationTest")],
        "default_test_class": "E2etest",
        "handler_pick": "last",
    }
    tr = read_transcripts(spark, SF_SMALL)
    base = build_graph(spark, tr)
    packed = build_graph(spark, tr, pack=pack)

    # 1. defaults-as-pack == packless, byte-for-byte (request_styles
    # spelled out as the transcriptish default: numseg + full chain)
    same = build_graph(
        spark,
        tr,
        pack={
            "test_classes": None,
            "handler_pick": "first",
            "request_styles": [
                "numseg", "angle", "colon", "brace", "paren",
                "brace_opt", "catchall", "bracket",
            ],
        },
    )
    assert same["edges"].exceptAll(base["edges"]).isEmpty()
    assert base["edges"].exceptAll(same["edges"]).isEmpty()

    # 2. pack classification: Test census == oracle census of the
    # SAME pack over the oracle's own first_def derivation, and it
    # genuinely differs from the default tid%3 split
    kinds = ("UnitTest", "IntegrationTest", "E2etest")

    def census(g):
        return {
            (r.node_type, r.n)
            for r in g["nodes"]
            .where(F.col("node_type").isin(*kinds))
            .groupBy("node_type")
            .agg(F.count("*").alias("n"))
            .collect()
        }

    want = set(
        duck.execute(
            T.q(
                f"SELECT {D.classify_test_sql(pack, chr(39) + 'test_' + chr(39) + ' || tid', 'duckdb')}"
                " AS node_type, count(*) AS n FROM first_def GROUP BY 1"
            )
        ).fetchall()
    )
    assert census(packed) == want and census(packed) != census(base)

    # 3. HANDLER 'last' == the oracle's DESC pick over its own
    # request->endpoint paths_match join
    got_h = {
        (r.source_key, r.target_key)
        for r in packed["edges"].where("edge_type = 'HANDLER'").collect()
    }
    want_h = set(
        duck.execute(
            T.q(
                "SELECT en.node_key AS source_key,"
                f" {T._turn_key('fr.conv_id', 'fr.turn_idx')} AS target_key"
                " FROM (SELECT entity_id, conv_id, turn_idx FROM ("
                "   SELECT ep.entity_id, r.conv_id, r.turn_idx,"
                "          row_number() OVER (PARTITION BY ep.entity_id"
                "            ORDER BY r.conv_id DESC, r.turn_idx DESC) AS rk"
                f"  FROM requests r JOIN eps ep ON ep.verb = r.verb AND {T._ep_match('r.norm_path')})"
                " WHERE rk = 1) fr JOIN ent_nodes en ON en.start = fr.entity_id"
            )
        ).fetchall()
    )
    base_h = {
        (r.source_key, r.target_key)
        for r in base["edges"].where("edge_type = 'HANDLER'").collect()
    }
    assert got_h == want_h and got_h != base_h and len(got_h) > 0

    # 4. every NON-hooked family is untouched: drop HANDLER and any
    # edge touching a Test node key (the classification is inside
    # the key), then the edge sets must be byte-identical
    tk = (
        base["nodes"].where(F.col("node_type").isin(*kinds)).select("node_key")
        .union(packed["nodes"].where(F.col("node_type").isin(*kinds)).select("node_key"))
        .distinct()
    )

    def core(g):
        e = g["edges"].where("edge_type <> 'HANDLER'")
        e = e.join(tk, e.source_key == tk.node_key, "left_anti")
        return e.join(tk, e.target_key == tk.node_key, "left_anti")

    assert core(base).exceptAll(core(packed)).isEmpty()
    assert core(packed).exceptAll(core(base)).isEmpty()


def test_filter_files_predicates_reach_the_scan(spark, tmp_path):
    """filter_files renders sargable string predicates: the parquet
    scan's PushedFilters carries the EndsWith/Contains arms instead
    of evaluating the stack post-scan."""
    from stakgraph_spark.operators.files import filter_files

    p = str(tmp_path / "files.parquet")
    spark.createDataFrame(
        [(f, i) for i, (_c, f) in enumerate(D.FILE_CASES)], "file string, sz int"
    ).write.parquet(p)
    df = spark.read.parquet(p)
    # single-arm stacks stay AND-only => fully pushable
    kept = filter_files(df, {"binary_exts": [".png"], "junk_dirs": ["node_modules"]})
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "EndsWith" in pushed or "StringEndsWith" in pushed
    got = {r.file for r in kept.collect()}
    assert "assets/logo.png" not in got and "node_modules/leftpad/index.js" not in got
    assert "src/app.py" in got


def test_filter_files_escapes_like_wildcards(spark):
    from stakgraph_spark.operators.files import filter_files

    df = spark.createDataFrame([("a_gen.go",), ("xgen.go",)], "file string")
    got = {r.file for r in filter_files(df, {"skip_file_ends": ["_gen.go"]}).collect()}
    assert got == {"xgen.go"}  # bare _ would have matched both


def test_component_template_hooks(spark):
    """Round-4 widening: the component-template finder family
    (angular.rs:23-44 decorator query + template_ext, 296-361
    selector->template map, 364-420 renders scan) as pack data."""
    out = _spark_rows(spark, "angularish", D.DIALECT_PACKS["angularish"])
    seltpl = {r[2]: r[3] for r in out if r[1] == "seltpl"}
    renders = {r[2]: r[3] for r in out if r[1] == "renders"}

    # the map: wrong-suffix files (helpers.ts) and selector-less
    # decorators (badge) are skipped; paths resolve './' against the
    # component file's directory (angular.rs:223-241, 353-358)
    assert seltpl == {
        "app-nav": "src/app/nav/nav.component.html",
        "app-cart": "src/app/cart/cart.component.html",
        "app-ghost": "src/app/ghost/ghost.component.html",
    }
    # renders: ext-gated pages only (docs/snippet.txt drops out), the
    # unplanted ghost target emits nothing (find_page_fn None,
    # angular.rs:401-409), and the reference's substring semantics
    # are preserved EXACTLY — '<app-navbar' contains '<app-nav'
    # (angular.rs:400), so the x page renders nav
    assert renders == {
        "0:app-nav": "src/app/shell/shell.component.html RENDERS src/app/nav/nav.component.html",
        "1:app-nav": "src/app/cart/cart.component.html RENDERS src/app/nav/nav.component.html",
        "4:app-nav": "src/app/x/x.component.html RENDERS src/app/nav/nav.component.html",
    }
    # packs without the key emit nothing (mod.rs:245-247 None default)
    for name in ("flaskish", "goish", "nextish"):
        rows = _spark_rows(spark, name, D.DIALECT_PACKS[name])
        assert not [r for r in rows if r[1] in ("seltpl", "renders")]
    # angularish's bare-extension is_extra_page (angular.rs:242-247):
    # a stylesheet with no dir gate, where railsish needs /views/
    xp = {r[2]: r[3] for r in out if r[1] == "xpage"}
    assert xp["7"] == "src/styles/theme.scss"
    assert xp["8"] == "src/styles/dark.sass"  # angular.rs:246


def test_identifier_and_parent_resolve_differ_per_pack(spark):
    """identifier_query (ruby.rs:184-186 vs kotlin.rs:15-17 vs the
    mod.rs:95-97 default shape) and find_function_parent
    (python.rs:105-133 range walk vs go.rs:206-229 receiver lookup)
    as pack data: the same planted rows answer differently."""
    out = {
        name: _spark_rows(spark, name, pack)
        for name, pack in D.DIALECT_PACKS.items()
    }

    def kind(name, k):
        return {r[2]: r[3] for r in out[name] if r[1] == k}

    # identifier: scope segments captured only by railsish; angularish
    # requires the export prefix; non-class lines match nobody
    assert kind("railsish", "ident") == {
        "0": "Admin::User",
        "1": "CartComponent",
        "2": "Point",
    }
    assert kind("javaish", "ident")["0"] == "Admin"  # :: stops the rule
    assert kind("angularish", "ident") == {"1": "CartComponent"}
    assert kind("flaskish", "ident") == {}  # no hook -> no rows

    # parent_resolve: the SAME function rows resolve differently.
    fl, go = kind("flaskish", "parent"), kind("goish", "parent")
    assert fl == {
        "0": "Meta:20",    # innermost of User[10,80] / Meta[20,40]
        "1": "User:10",    # outside Meta's span
        "4": "Store:5",    # range hit despite empty receiver
        "5": "User:10",    # receiver ignored by the range strategy
    }
    assert go == {
        "3": "Store:5",    # declared receiver, by name
        "5": "Order:100",  # receiver wins over the enclosing span
    }
    assert kind("railsish", "parent") == {}  # no hook -> no rows


def test_direct_class_calls_and_filter_by_implements(spark):
    """direct_class_calls (ruby.rs:551-553; format.rs:758-764's
    exactly-one gate) and filter_by_implements (rust.rs:351-353;
    format.rs:59-78's first-match trait) as pack booleans."""
    out = {
        name: _spark_rows(spark, name, pack)
        for name, pack in D.DIALECT_PACKS.items()
    }

    def kind(name, k):
        return {r[2]: r[3] for r in out[name] if r[1] == k}

    # exactly-one: the duplicated 'Dup' class and the unknown 'Ghost'
    # both record nothing
    assert kind("railsish", "classcall") == {
        "0": "User->save",
        "3": "Order->submit",
    }
    assert kind("goish", "classcall") == {}  # trait false default
    # survivors carry the FIRST matching trait (ord 0 beats ord 1);
    # classes without an implements row are filtered out — both Dup
    # rows, Meta, Order
    assert kind("rustish", "implements") == {
        "0": "User impl Serializable",
        "3": "Store impl Repository",
    }
    assert kind("javaish", "implements") == {}
    # rustish keeps duplicate refs in one turn; javaish dedups the
    # same extraction rule (the distinct flag is pack data)
    rs = [r for r in out["rustish"] if r[1] == "extract" and r[2] == "7"]
    jv = [r for r in out["javaish"] if r[1] == "extract" and r[2] == "7"]
    assert len(rs) == 2 and len(jv) == 1


def test_endpoint_group_prefix_per_pack(spark):
    """endpoint_group_find + process_endpoint_groups as pack data
    (go.rs:190-201 Mount vs java.rs:152-165 @RequestMapping;
    array_graph.rs:187-217's group-path prefix rewrite): the same
    planted registrations drive different rewrites per pack, and
    endpoints of unmatched handlers are untouched."""
    out = {
        name: _spark_rows(spark, name, pack)
        for name, pack in D.DIALECT_PACKS.items()
    }

    def kind(name, k):
        return {r[2]: r[3] for r in out[name] if r[1] == k}

    assert kind("goish", "epgroup") == {
        "0": "/tribes/list",
        "1": "/tribes/create",
    }
    assert kind("javaish", "epgroup") == {"2": "/api/v2/orders"}
    assert kind("flaskish", "epgroup") == {}  # trait None default


def test_epparents_istest_itedge_dmwithin_hooks(spark):
    """The round-4 hook batch: find_endpoint_parents (ruby.rs:419-464
    nested-block prefixing, outermost first), is_test (go.rs:282
    'Test' starts_with — 'Tester' passes — vs python.rs:317 'test_'
    vs ruby.rs:250-252 file delegation), integration_test_edge_finder
    (ruby.rs:487-499 exact-name Test→Class CALLS), and
    data_model_within_finder (ruby.rs:221-249: functions in
    {inflected dm name}_controller.rb CONTAIN the Datamodel) — each
    as pack data over shared planted dims."""
    out = {
        name: _spark_rows(spark, name, pack)
        for name, pack in D.DIALECT_PACKS.items()
    }

    def kind(name, k):
        return {r[2]: r[3] for r in out[name] if r[1] == k}

    # the SAME enclosing rows: railsish reads namespace/resources,
    # expressish reads router.use prefixes, goish nothing (trait
    # default); the marker-free row 3 is rewritten by nobody
    assert kind("railsish", "epparents") == {
        "0": "/admin/users/list",
        "1": "/orders/show",
    }
    assert kind("expressish", "epparents") == {"2": "/admin/v2/users"}
    assert kind("goish", "epparents") == {}

    # goish: case-sensitive 'Test' prefix takes TestLogin AND Tester;
    # flaskish: only test_checkout; railsish delegates to its
    # _spec.rb file rule and claims only the helper IN a spec file
    truthy = lambda d: {k for k, v in d.items() if v == "true"}
    assert truthy(kind("goish", "istest")) == {"0", "3"}
    assert truthy(kind("flaskish", "istest")) == {"1"}
    assert truthy(kind("railsish", "istest")) == {"2"}

    # itedge: exact-name class match or nothing (railsish only)
    assert kind("railsish", "itedge") == {
        "0": "CustomerController CALLS Class:CustomerController",
        "1": "Helper CALLS Class:Helper",
    }
    assert kind("goish", "itedge") == {}

    # dm_within composes railsish's OWN pluralize+lower dm-name rules
    # (Customer→customers, Status→statuses) before the suffix probe
    assert kind("railsish", "dmwithin") == {
        "0:6": "show CONTAINS Customer",
        "0:7": "index CONTAINS Customer",
        "2:8": "update CONTAINS Status",
    }
    assert kind("flaskish", "dmwithin") == {}


def test_islib_troperand_xpfind_hooks_per_pack(spark):
    """Round-4 widening, batch 8: is_lib_file (mod.rs:61-63 default /
    typescript.rs:37-43 union / react.rs:89-91 node_modules-only),
    find_trait_operand (go.rs:228-246), extra_page_finder's three
    reference styles (react.rs:817-851 default-export,
    ruby.rs:516-550 controller-then-mailer, angular.rs:253-294
    reversed component pairing) as pack data."""
    out = {
        name: _spark_rows(spark, name, D.DIALECT_PACKS[name])
        for name in ("flaskish", "expressish", "goish",
                     "railsish", "nextish", "angularish")
    }

    def kind(name, k):
        return {r[2]: r[3] for r in out[name] if r[1] == k}

    truthy = lambda d: {k for k, v in d.items() if v == "true"}
    # islib renders for EVERY pack: absent key = the trait's
    # absolute-path default (flaskish takes /usr AND /home/.nvm);
    # expressish's five-condition union takes everything but the
    # relative source file; nextish's node_modules-only rule takes
    # exactly one row — three different answers to the SAME six paths
    assert truthy(kind("flaskish", "islib")) == {"0", "4"}
    assert truthy(kind("expressish", "islib")) == {"0", "1", "2", "3", "4"}
    assert truthy(kind("nextish", "islib")) == {"1"}

    # troperand: the (line,file) trait lookup hits rows 0 and 2;
    # row 1's position matches no trait and must emit nothing
    # (go.rs:243 Ok(None)); packs without the flag emit no arm
    assert kind("goish", "troperand") == {
        "0": "Store OPERAND Get",
        "2": "Loader OPERAND load",
    }
    assert kind("railsish", "troperand") == {}

    # xpfind: nextish renders the default export, page-alone when the
    # file exports none; railsish resolves the controller first, the
    # mailer fallback second, and DROPS the handlerless view
    # (ruby.rs:548); angularish emits the REVERSED edge and keeps the
    # orphan page-alone. Each pack's own extra_page gate picks its
    # rows, so the same seven planted files split three ways.
    assert kind("nextish", "xpfind") == {
        "0": "web/src/app/billing/page.tsx RENDERS BillingPage",
        "1": "web/src/app/docs/page.tsx",
    }
    assert kind("railsish", "xpfind") == {
        "2": "app/views/customers/show.html.erb RENDERS show",
        "3": "app/views/orders_mailer/receipt.html.erb RENDERS receipt",
    }
    assert kind("angularish", "xpfind") == {
        "5": "HeroBannerComponent RENDERS src/ui/hero-banner.component.html",
        "6": "src/ui/orphan-widget.component.css",
        # .sass stylesheet pairs like any other component asset
        # (angular.rs:246,266 — round-4 ADVICE fix)
        "7": "SideNavComponent RENDERS src/ui/side-nav.component.sass",
    }
    assert kind("flaskish", "xpfind") == {}


def test_pgname_opconv_dmvariant_hooks_per_pack(spark):
    """The round-5 hook batch: page_name styles (react.rs:994-1029
    app-dir/pages-stem/fallback vs builder/utils.rs:31-37 +
    angular.rs:270 last segment), the function_call_query
    operand-emission convention (format.rs:750-765 reads only
    @OPERAND; what each grammar binds differs — python.rs:133,
    go.rs:140, ruby.rs:137, java.rs:120, rust.rs:190, cpp.rs:173),
    and the goish dm_within store-file variant — all pack data over
    shared planted dims."""
    out = {
        name: _spark_rows(spark, name, pack)
        for name, pack in D.DIALECT_PACKS.items()
    }

    def kind(name, k):
        return {r[2]: r[3] for r in out[name] if r[1] == k}

    # page_name: the SAME planted files — nextish names app-router
    # pages by parent dir and collapses pages-router index files;
    # railsish/angularish keep the basename; flaskish has no
    # page_query (mod.rs:242-244)
    nx = kind("nextish", "pgname")
    assert nx["2"] == "items" and nx["3"] == "__tests__" and nx["4"] == "app"
    assert nx["6"] == "about" and nx["9"] == "docs" and nx["10"] == "index"
    assert nx["0"] == "page"  # rails view: react's fallback
    rb = kind("railsish", "pgname")
    assert rb["0"] == "index.html.erb" and rb["9"] == "index.tsx"
    assert kind("angularish", "pgname")["7"] == "theme.scss"
    assert kind("flaskish", "pgname") == {}

    # opconv: five packs, five answers on the same five call sites
    assert kind("flaskish", "opconv") == {"0": "save", "1": "db OPERAND save"}
    assert kind("goish", "opconv") == {
        "0": "save",
        "1": "db OPERAND save",
        "2": "a.b OPERAND save",   # whole selector chain captured
        "3": "save",               # call receiver matches, unbound
    }
    assert kind("railsish", "opconv") == {
        "1": "db OPERAND save",        # bare call: NO match (receiver required)
        "2": "a.b OPERAND save",
        "3": "fetch() OPERAND save",   # call receiver captured as text
    }
    assert kind("javaish", "opconv") == {
        "0": "save",
        "1": "db OPERAND save",
        "2": "a.b OPERAND save",
        "3": "fetch() OPERAND save",
    }
    assert kind("rustish", "opconv") == {
        "0": "save",
        "1": "save",                # field_expression binds only the field
        "2": "save",
        "3": "save",
        "4": "Mod OPERAND save",    # scoped_identifier binds the module path
    }
    assert kind("cppish", "opconv") == {
        "0": "save",
        "1": "db OPERAND save",
        "4": "save",                # namespace bound to a non-OPERAND capture
    }
    assert kind("angularish", "opconv") == {}
    # typescriptish (typescript.rs:152-170): the member arm binds its
    # receiver to @CLASS_NAME, not @OPERAND — simple receivers match
    # but emit no operand; deeper chains fall out of the pattern
    assert kind("typescriptish", "opconv") == {"0": "save", "1": "save"}

    # the goish dm_within variant: snake(Customer)+'_store.go' finds
    # SaveCustomer; railsish's controller suffix is untouched by it
    assert kind("goish", "dmwithin") == {"0:13": "SaveCustomer CONTAINS Customer"}


def test_restful_routes_hook(spark):
    """rails_routes.rs:125-230 generate_endpoint_path as pack data:
    railsish composes the exact reference paths over the planted
    route declarations (standard action table, verb fallback,
    collection/member last-parent exclusion, resource_member
    :singular_id, namespace/nested-resource prefixes, the
    parent-already-in-path guard); no other shipped pack carries the
    key (the explicit-path default, :126-128); and the tables are
    DATA — a variant pack swapping ':id' -> ':uuid' moves exactly
    the action/verb-suffixed rows while the member item's ':id'
    stays (it is composition, hardcoded at :179, not table data)."""
    expected = {
        "0": "/orders",
        "1": "/orders/:id",
        "2": "/orders/:id/edit",
        "3": "/orders/new",
        "4": "/orders/:id",
        "5": "/orders/:id",
        "6": "/orders/:id",
        "7": "/orders/:id/edit",
        "8": "/orders",
        "9": "/orders",
        "10": "/profiles/enrich_profile",
        "11": "/profiles/:id/enrich_profile",
        "12": "/intro_requests/:intro_request_id/create_from_public_page",
        "13": "/admin/users/:id",
        "14": "/posts/:post_id/comments",
        "15": "/admin/orders",
        "16": "/admin/profiles/stats",
        "17": "/posts/:post_id/preview",
        "18": "/orders/:order_id/posts/:post_id/:id",
        "19": "/orders",
        "20": "/orders",
    }
    out = _spark_rows(spark, "railsish", D.DIALECT_PACKS["railsish"])
    got = {r[2]: r[3] for r in out if r[1] == "restpath"}
    assert got == expected
    # oracle parity for the new arm specifically
    ora = {
        r[2]: r[3]
        for r in _oracle_rows({"railsish": D.DIALECT_PACKS["railsish"]})
        if r[1] == "restpath"
    }
    assert ora == expected
    # only railsish ships the hook (data-level check: absent key =
    # the arm never renders)
    assert [n for n, p in D.DIALECT_PACKS.items() if "restful_routes" in p] == ["railsish"]

    uuid_rr = {
        "actions": [
            ("index", ""), ("new", "/new"), ("create", ""),
            ("show", "/:uuid"), ("edit", "/:uuid/edit"),
            ("update", "/:uuid"), ("destroy", "/:uuid"),
        ],
        "verb_id": ["PUT", "PATCH", "DELETE"],
        "get_names": [("show", "/:uuid"), ("edit", "/:uuid/edit")],
        "singular": ["s$", ""],
    }
    variant = {**D.DIALECT_PACKS["railsish"], "restful_routes": uuid_rr}
    vgot = {
        r[2]: r[3]
        for r in _spark_rows(spark, "uuidish", variant)
        if r[1] == "restpath"
    }
    moved = {k for k in expected if vgot[k] != expected[k]}
    assert moved == {"1", "2", "4", "6", "7", "13", "18"}
    assert vgot["1"] == "/orders/:uuid" and vgot["13"] == "/admin/users/:uuid"
    # the member-item ':id' is composition, not table data
    assert vgot["11"] == "/profiles/:id/enrich_profile"


def test_kotlinish_swiftish_packs(spark):
    """Packs 10 and 11 (kotlin.rs / swift.rs) are dict literals over
    the SAME fixed interpreters: kotlin's call-method-eq verb tiers
    with the GET default (kotlin.rs:207-224), drop-last-TWO dotted
    imports (kotlin.rs:266-274), gradle-kts implementation() lib
    lines (kotlin.rs:31-38), the app/models dm filter
    (kotlin.rs:235-237) and the classify_test TRAIT default
    (mod.rs:183, an empty rule list); swift's body-substring verb
    tiers in reference order with NO fallthrough verb
    (swift.rs:128-143) and the CoreData dm filter (swift.rs:174-176).
    Both must match their oracle rendering exactly."""
    kot = _spark_rows(spark, "kotlinish", D.DIALECT_PACKS["kotlinish"])
    swi = _spark_rows(spark, "swiftish", D.DIALECT_PACKS["swiftish"])
    assert kot == [
        r for r in _oracle_rows({"kotlinish": D.DIALECT_PACKS["kotlinish"]})
    ]
    assert swi == [
        r for r in _oracle_rows({"swiftish": D.DIALECT_PACKS["swiftish"]})
    ]

    def kind(rows, k):
        return {r[2]: r[3] for r in rows if r[1] == k}

    # kotlin: the registration call's METHOD identifier, exact,
    # GET default — rows that rustish/expressish call_contains
    # answers '' (app.route, bare handler) default to GET here
    kv = kind(kot, "verb")
    assert kv["2"] == "POST" and kv["4"] == "DELETE" and kv["6"] == "PUT"
    assert kv["1"] == "GET" and kv["3"] == "GET" and kv["5"] == "GET"
    # swift: body tiers; registrations carry no body -> '' (no
    # default verb, swift.rs sets none); bodyParams-nil is a GET
    # tier; the POST+nil row proves reference tier ORDER (GET wins)
    sv = kind(swi, "verb")
    assert sv["0"] == "" and sv["3"] == ""
    assert sv["7"] == "GET" and sv["8"] == "POST" and sv["10"] == "DELETE"
    assert sv["9"] == "GET" and sv["11"] == "GET" and sv["12"] == ""
    # kotlin imports drop the last TWO dotted segments (javaish
    # drops one): the same planted row splits the two JVM packs
    assert kind(kot, "import")["2"] == "java"
    assert kind(kot, "import")["5"] == "a/b"
    jav = _spark_rows(spark, "javaish", D.DIALECT_PACKS["javaish"])
    assert kind(jav, "import")["2"] == "java/util"
    assert kind(kot, "impname")["2"] == "List" == kind(jav, "impname")["2"]
    # gradle-kts call lines: only the implementation("g:a:v") row
    assert kind(kot, "lib") == {"17": "io.ktor:ktor-server-core@2.3.4"}
    # dm path filters: app/models vs CoreData claim disjoint rows
    assert kind(kot, "dmfile") == {"1": "app/models/user.rb"}
    assert kind(swi, "dmfile") == {"4": "App/CoreData/Person.swift"}
    # classify_test trait default: EVERY planted name is a UnitTest
    assert set(kind(kot, "test").values()) == {"UnitTest"}
    # is_test prefix 'test' (no underscore, case-sensitive):
    # takes test_checkout AND testValue, rejects TestLogin/Tester
    assert kind(kot, "istest") == {
        "0": "false", "1": "true", "2": "false",
        "3": "false", "4": "true", "5": "false",
    }


def test_svelteish_pack(spark):
    """Pack 12 (svelte.rs), the deliberately SPARSE frontend-only
    Stack: markup-tag identifiers ((tag_name), svelte.rs:134-136)
    fire on the planted markup line and on nothing else; NO
    request-template vocabulary (svelte.rs's request_finder only
    matches the fetch/verb call, :112-121 — templates pass through
    the slash-normalizer verbatim); classify_test is the trait
    default; is_test = starts_with('test'), no underscore
    (svelte.rs:151-153); enclosing-range parents (:88-95); and the
    hooks svelte.rs never implements (lib manifest, endpoint verbs,
    dm path filter) emit NOTHING — absence is the trait's None
    default, not an empty-string row."""
    sv = _spark_rows(spark, "svelteish", D.DIALECT_PACKS["svelteish"])
    assert sv == _oracle_rows({"svelteish": D.DIALECT_PACKS["svelteish"]})

    def kind(rows, k):
        return {r[2]: r[3] for r in rows if r[1] == k}

    # tag identifiers: ONLY the markup row; declaration lines ignored
    assert kind(sv, "ident") == {"4": "CartWidget"}
    # no template styles: <id>/{id}/[uid] all survive; only the
    # trait-level slash normalization applies (trailing slash strip)
    nm = kind(sv, "norm")
    assert nm["0"] == "/api/items/<id>"
    assert nm["2"] == "/api/items/{id}"
    assert nm["5"] == "/api/u/[uid]/posts"
    assert nm["7"] == "/api/x/<id>/{z}"
    # classify_test trait default
    assert set(kind(sv, "test").values()) == {"UnitTest"}
    # is_test: the no-underscore prefix (same rows as kotlinish)
    assert kind(sv, "istest")["1"] == "true" and kind(sv, "istest")["4"] == "true"
    assert kind(sv, "istest")["2"] == "false"
    # enclosing-range parents: identical pick to flaskish's walk-up
    assert kind(sv, "parent") == kind(
        _spark_rows(spark, "flaskish", D.DIALECT_PACKS["flaskish"]), "parent"
    )
    # unimplemented hooks emit nothing
    for k in ("lib", "verb", "dmfile", "import", "impname"):
        assert kind(sv, k) == {}


def test_empty_ruleset_pack_drives_production_build(spark):
    """The classify_test TRAIT default as an empty rule list
    (mod.rs:183; kotlin.rs / swift.rs ship no override) through the
    PRODUCTION build: build_graph(pack=kotlinish) classifies every
    test as the default class, where the packless tid%3 dialect
    splits them three ways — the same classify_test_sql rendering
    serves the dialect surface and the pipeline."""
    from pyspark.sql import functions as F

    from stakgraph_spark.plans.pipeline import build_graph
    from stakgraph_spark.sources.transcripts import read_transcripts
    from tests.conftest import SF_SMALL

    kinds = ("UnitTest", "IntegrationTest", "E2etest")
    tr = read_transcripts(spark, SF_SMALL)

    def split(g):
        return {
            r.node_type
            for r in g["nodes"]
            .where(F.col("node_type").isin(*kinds))
            .select("node_type")
            .distinct()
            .collect()
        }

    assert split(build_graph(spark, tr, pack=D.DIALECT_PACKS["kotlinish"])) == {
        "UnitTest"
    }
    assert len(split(build_graph(spark, tr))) == 3


def _ref_generate_endpoint_path(res, action, verb, ep_name,
                                item_type, item_name, parents):
    """A faithful Python transcription of rails_routes.rs:125-230
    generate_endpoint_path (the differential oracle for the property
    test below; planted names are regular plurals, so to_singular is
    the pack's s$-strip)."""
    sing = lambda n: n[:-1] if n.endswith("s") else n
    if item_type in ("collection", "member"):
        pu = parents[:-1]
    elif item_type == "resource_member":
        pu = parents
    else:
        pu = parents[:-1] if parents and parents[-1][1] == res else parents
    parts = []
    for kind, name in pu:
        if kind == "ns":
            parts.append(name)
        else:
            parts.append(name)
            parts.append(f":{sing(name)}_id")
    if item_type == "collection":
        parts += [res, item_name]
        return "/" + "/".join(parts)
    if item_type == "member":
        parts += [res, ":id", item_name]
        return "/" + "/".join(parts)
    if item_type == "resource_member":
        if res not in parts:
            parts += [res, f":{sing(res)}_id"]
        parts.append(item_name)
        return "/" + "/".join(parts)
    if res not in parts:
        parts.append(res)
    if action:
        parts += {
            "index": [], "new": ["new"], "create": [], "show": [":id"],
            "edit": [":id", "edit"], "update": [":id"], "destroy": [":id"],
        }.get(action, [])
    elif verb in ("PUT", "PATCH", "DELETE"):
        parts.append(":id")
    elif verb == "GET":
        if ep_name == "show":
            parts.append(":id")
        elif ep_name == "edit":
            parts += [":id", "edit"]
    return "/" + "/".join(parts)


def test_restful_routes_property_vs_reference_transcription():
    """Differential property test: the pack-data SQL rendering of
    generate_endpoint_path equals a line-faithful Python
    transcription of rails_routes.rs:125-230 on randomized route
    declarations (resources, all action/verb/name combinations,
    item types, parent chains up to depth 3 mixing namespaces and
    nested resources — including chains that repeat the resource,
    the case the planted row 18 pins)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    names = st.sampled_from(["orders", "posts", "users", "profiles", "admin"])
    parent = st.tuples(st.sampled_from(["ns", "res"]), names)
    rows = st.tuples(
        names,                                                  # res
        st.sampled_from(["", "index", "new", "create", "show",
                         "edit", "update", "destroy", "archive"]),
        st.sampled_from(["", "GET", "POST", "PUT", "PATCH", "DELETE"]),
        st.sampled_from(["", "show", "edit", "list", "stats"]),  # ep_name
        st.sampled_from(["", "collection", "member", "resource_member"]),
        st.sampled_from(["stats", "preview", "enrich"]),         # item_name
        st.lists(parent, max_size=3),
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(rows, min_size=1, max_size=8))
    def check(cases):
        lits = []
        want = {}
        for i, (res, action, verb, ep_name, itype, iname, parents) in enumerate(cases):
            iname_eff = iname if itype else ""
            lits.append(
                f"({i}, '{res}', '{action}', '{verb}', '{ep_name}',"
                f" '{itype}', '{iname_eff}',"
                f" '{','.join(k + ':' + n for k, n in parents)}')"
            )
            want[i] = _ref_generate_endpoint_path(
                res, action, verb, ep_name, itype, iname_eff, parents
            )
        cte = (
            "SELECT * FROM (VALUES " + ", ".join(lits) + ") AS t(rrid,"
            " res, action, verb, ep_name, item_type, item_name, parents)"
        )
        sql = D.restful_routes_sql(D.DIALECT_PACKS["railsish"], "duckdb")
        got = dict(duckdb.sql(f"WITH rrc AS ({cte}) {sql}").fetchall())
        assert got == want

    check()


def test_lib_section_scoping_property_vs_reference_transcription():
    """Differential property test for toml.rs's lib_query semantics
    (queries/toml.rs:26-50) as rendered by lib_extract_sql: on
    randomized manifests (headers, string-form deps, inline-table
    deps, junk, in arbitrary order) the DuckDB rendering of the
    pack's section-scoped multi-form rule equals a line-faithful
    Python transcription — a dep counts iff the nearest PRECEDING
    [header] equals 'dependencies' (#eq? @section, toml.rs:28) and
    the line matches the string (:33) or inline-table (:36-41)
    version form; deps before any header never count."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    pack = D.DIALECT_PACKS["rustish"]
    forms = [re.compile(f) for f in pack["lib_manifest"]["forms"]]
    want_sec = pack["lib_manifest"]["section"]["want"]

    names = st.sampled_from(["serde", "tokio", "anyhow", "rand", "log"])
    vers = st.sampled_from(["1.0", "0.8.5", "2", "1.35.0"])
    line = st.one_of(
        st.sampled_from(
            ["[dependencies]", "[dev-dependencies]", "[package]",
             "[build-dependencies]", "# comment", "edition = 2021", ""]
        ),
        st.builds(lambda n, v: f'{n} = "{v}"', names, vers),
        st.builds(
            lambda n, v, extra: f'{n} = {{ version = "{v}"'
            + (', features = ["full"] }' if extra else " }"),
            names, vers, st.booleans(),
        ),
        # near-misses: unquoted version, version key absent
        st.builds(lambda n, v: f"{n} = {v}", names, vers),
        st.builds(lambda n, v: f'{n} = {{ path = "../{n}" }}', names, vers),
    )

    def model(lines):
        sec, out = None, set()
        for lno, txt in enumerate(lines):
            if len(txt) >= 2 and txt[0] == "[" and txt[-1] == "]":
                sec = txt[1:-1]
                continue
            if sec != want_sec:
                continue
            for f in forms:
                m = f.match(txt)
                if m and m.end() == len(txt):
                    out.add((lno, f"{m.group(1)}@{m.group(2)}"))
                    break
        return out

    @settings(max_examples=80, deadline=None)
    @given(st.lists(line, min_size=1, max_size=14))
    def check(lines):
        lits = ", ".join(
            f"({i}, 'Cargo.toml', '{t.replace(chr(39), chr(39) * 2)}')"
            for i, t in enumerate(lines)
        )
        cte = f"SELECT * FROM (VALUES {lits}) AS t(lno, fpath, line)"
        sql = D.lib_extract_sql(pack, "duckdb")
        got = set(duckdb.sql(f"WITH mc AS ({cte}) {sql}").fetchall())
        assert got == model(lines)

    check()
