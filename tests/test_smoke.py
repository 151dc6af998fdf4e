from morphik_core_spark.sources.tables import TABLES, load_table


def test_session_boots(spark):
    assert spark.range(10).count() == 10


def test_all_tables_load(spark, sf_dir):
    for name in TABLES:
        df = load_table(spark, name, sf_dir)
        assert len(df.columns) > 0, name
