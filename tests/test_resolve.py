from ulh_etl_spark.resolve import ColumnResolver, norm_name


def test_norm_name():
    assert norm_name("Appt Provider") == "apptprovider"
    assert norm_name("appt_provider") == "apptprovider"
    assert norm_name("APPT-PROVIDER!") == "apptprovider"


def test_resolver_exact_wins():
    r = ColumnResolver(["Appt_Provider", "apptprovider"])
    assert r.resolve("Appt_Provider") == "Appt_Provider"
    # normalized collision: first column wins
    assert r.resolve("Appt Provider") == "Appt_Provider"


def test_resolver_missing():
    r = ColumnResolver(["a", "b"])
    assert r.resolve("zzz") is None
    assert r.missing(["a", "zzz"]) == ["zzz"]
