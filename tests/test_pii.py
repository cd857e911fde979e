"""PII scrub: known-string redaction/count semantics and the pinned
replacement-order contract."""

from transmogrify_webcrawler_spark.operators.pii import pii_stats


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    return {r["doc_id"]: r for r in pii_stats(df).collect()}


def test_counts_and_redaction(spark):
    out = _run(spark, [
        "mail a@b.com and c.d+x@e.org, call 555-123-4567, host 10.0.0.1",
        "no pii here at all",
        "two ips 1.2.3.4 and 255.255.255.255",
    ])
    r0 = out[0]
    assert (r0["n_emails"], r0["n_phones"], r0["n_ips"]) == (2, 1, 1)
    assert r0["redacted"] == ("mail <EMAIL> and <EMAIL>, call <PHONE>, "
                              "host <IP>")
    r1 = out[1]
    assert (r1["n_emails"], r1["n_phones"], r1["n_ips"]) == (0, 0, 0)
    assert r1["redacted"] == "no pii here at all"
    r2 = out[2]
    assert r2["n_ips"] == 2
    assert r2["redacted"] == "two ips <IP> and <IP>"


def test_order_contract_email_digits_not_eaten_by_ip(spark):
    # an email whose local part looks dotted-numeric: email redaction runs
    # first, so the IP pattern never sees it
    out = _run(spark, ["u1.2.3.4@ex.com stays one email"])
    r = out[0]
    assert (r["n_emails"], r["n_ips"]) == (1, 0)
    assert r["redacted"] == "<EMAIL> stays one email"


def test_counts_taken_before_redaction(spark):
    # the <PHONE> token itself must not create or destroy IP counts; counts
    # are computed on the original text
    out = _run(spark, ["555-123-4567 at 9.9.9.9"])
    r = out[0]
    assert (r["n_phones"], r["n_ips"]) == (1, 1)
    assert r["redacted"] == "<PHONE> at <IP>"
