"""The examples/quickstart.py script must keep running end-to-end — it
is the living documentation of the public engine surface."""


def test_quickstart_runs(spark, tmp_path):
    import examples.quickstart as Q

    Q.main(str(tmp_path / "wh"))
