from dbcut_spark.catalog import TPCH_CATALOG, synthesize_pk
from dbcut_spark.config import normalize_query
from dbcut_spark.graph import Direction, build_relation_tree, relationships_of


def test_relationships_manytoone_first():
    rels = relationships_of(TPCH_CATALOG, "customer")
    assert rels[0].direction is Direction.MANYTOONE
    assert rels[0].target == "nation"
    targets = {r.target for r in rels}
    assert targets == {"nation", "orders", "events"}


def test_tree_depths():
    tree = build_relation_tree(
        TPCH_CATALOG, "customer", join_depth=3, backref_depth=2,
        exclude=["events", "part", "supplier"],
    )
    tables = tree.root.all_tables()
    assert tables == ["customer", "nation", "orders", "region", "lineitem"]


def test_tree_depth_zero():
    tree = build_relation_tree(TPCH_CATALOG, "customer", join_depth=0, backref_depth=0)
    assert tree.root.all_tables() == ["customer"]


def test_self_edge_visited_once():
    # each FK edge traversed at most once tree-wide (cycle guard)
    tree = build_relation_tree(TPCH_CATALOG, "lineitem", join_depth=9, backref_depth=9)
    edges = []
    for node in tree.root.walk():
        if node.relationship:
            edges.append(node.relationship.fk_name)
    assert len(edges) == len(set(edges))


def test_include_prunes():
    tree = build_relation_tree(
        TPCH_CATALOG, "region", join_depth=10**6, backref_depth=10**6,
        include=["customer"], exclude=["events", "supplier"],
    )
    assert tree.root.all_tables() == ["region", "nation", "customer"]


def test_render_mentions_arity():
    tree = build_relation_tree(TPCH_CATALOG, "nation", join_depth=1, backref_depth=1)
    art = tree.render()
    assert "¹ region" in art
    assert "ⁿ" in art
    assert "tables loaded" in art


def test_normalize_query_defaults():
    spec = normalize_query({"from": "customer", "limit": "no"})
    assert spec.limit is None
    assert spec.backref_limit == 50
    spec2 = normalize_query({"from": "customer"}, {"default_limit": 7})
    assert spec2.limit == 7


def test_include_sets_unlimited_depths():
    spec = normalize_query({"from": "region", "include": ["customer"]})
    assert spec.join_depth >= 10**6 and spec.backref_depth >= 10**6


def test_synthesize_pk():
    assert synthesize_pk(["id", "name"]) == (("id",), True)
    assert synthesize_pk(["name", "user_id"]) == (("user_id",), True)
    assert synthesize_pk(["a", "b"]) == (("a", "b"), True)


def _cyclic_catalog():
    """Self-FK (employee.manager_id) + mutual FKs (a.b_id ⟷ b.a_id)."""
    from dbcut_spark.catalog import Catalog, ForeignKey, TableSpec

    cat = Catalog()
    for name, pk, cols in [
        ("employee", ("emp_id",), ("emp_id", "manager_id", "name")),
        ("a", ("a_id",), ("a_id", "b_id")),
        ("b", ("b_id",), ("b_id", "a_id")),
    ]:
        cat.tables[name] = TableSpec(name, pk, cols)
    cat.fks = [
        ForeignKey("employee", ("manager_id",), "employee", ("emp_id",)),
        ForeignKey("a", ("b_id",), "b", ("b_id",)),
        ForeignKey("b", ("a_id",), "a", ("a_id",)),
    ]
    return cat


def test_self_fk_terminates():
    tree = build_relation_tree(_cyclic_catalog(), "employee", 10, 10)
    nodes = list(tree.root.walk())
    # root + exactly one hop over the self-FK (edge traversed once)
    assert len(nodes) == 2
    assert nodes[1].table == "employee"


def test_mutual_fk_terminates():
    tree = build_relation_tree(_cyclic_catalog(), "a", 10, 10)
    tables = [n.table for n in tree.root.walk()]
    assert tables[0] == "a"
    assert "b" in tables
    assert len(tables) <= 3  # never loops a→b→a→b…


def test_diamond_expands_once():
    """lineitem reaches nation via orders→customer AND via supplier;
    the second occurrence must not re-expand (reference
    already_browse_models semantics)."""
    tree = build_relation_tree(TPCH_CATALOG, "lineitem", 10, 0)
    nation_nodes = [n for n in tree.root.walk() if n.table == "nation"]
    expanded = [n for n in nation_nodes if n.children]
    assert len(expanded) <= 1


def test_cyclic_closure_executes(spark):
    """End-to-end: the frontier loop over a self-FK catalog terminates
    and returns exactly the reachable rows."""
    from dbcut_spark.config import normalize_query
    from dbcut_spark.operators.closure import ClosureExecutor
    from dbcut_spark.plans.extraction import build_plan

    cat = _cyclic_catalog()
    emp = spark.createDataFrame(
        [(1, None, "ceo"), (2, 1, "vp"), (3, 2, "eng"), (4, 2, "eng2"), (5, None, "lone")],
        "emp_id long, manager_id long, name string",
    )
    plan = build_plan(cat, {"from": "employee", "where": {"name": "eng"}, "limit": 1})
    ex = ClosureExecutor(spark, lambda t: emp)
    out = ex.execute(plan)
    rows = {r["emp_id"] for r in out["employee"].collect()}
    # eng(3) plus its manager(2) via the single self-FK hop
    assert rows == {3, 2}
