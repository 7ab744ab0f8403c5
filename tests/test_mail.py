"""mbox / RFC 5322 / MIME source: encodings, framing, quarantine."""

import pandas as pd
import pytest

from reading_the_unreadable_spark.sources.mail import (
    b64_encode_wrapped,
    build_mbox,
    decode_encoded_words,
    mbox_from_documents,
    parse_eml,
    parse_mbox,
    parse_mbox_frame,
    qp_decode,
    qp_encode,
)


def test_qp_roundtrip_including_softbreaks_and_utf8():
    s = "héllo = wörld, naïve café — " * 8
    enc = qp_encode(s)
    assert all(len(line) <= 76 for line in enc.split("\n"))
    assert qp_decode(enc) == s
    # literal =XX sequences in source text survive (the = is escaped)
    assert qp_decode(qp_encode("a=C3=A9b")) == "a=C3=A9b"


def test_encoded_words_q_and_b_forms():
    assert decode_encoded_words("=?utf-8?Q?Issue_42?=") == "Issue 42"
    assert decode_encoded_words("=?utf-8?Q?caf=C3=A9?=") == "café"
    assert decode_encoded_words("=?utf-8?B?Y2Fmw6k=?=") == "café"
    assert decode_encoded_words("plain stays") == "plain stays"


def test_eml_multipart_walk_and_header_folding():
    eml = (
        b"From: a@b\n"
        b"Subject: =?utf-8?Q?Hi_there?=\n"
        b"Content-Type: multipart/mixed;\n boundary=\"XX\"\n\n"
        b"preamble\n--XX\n"
        b"Content-Type: text/plain\n"
        b"Content-Transfer-Encoding: quoted-printable\n\n"
        b"caf=C3=A9\n--XX\n"
        b"Content-Type: application/pdf\n"
        b"Content-Transfer-Encoding: base64\n\n"
        + b64_encode_wrapped(b"%PDF-1.4 payload").encode()
        + b"\n--XX--\nepilogue\n"
    )
    parts = parse_eml(eml)
    assert [p["content_type"] for p in parts] == ["text/plain", "application/pdf"]
    assert parts[0]["text"] == "café" and parts[0]["subject"] == "Hi there"
    assert parts[1]["payload"] == b"%PDF-1.4 payload"
    assert [p["part_order"] for p in parts] == [1, 2]


def test_eml_error_contract():
    with pytest.raises(ValueError, match="malformed header"):
        parse_eml(b"not a header line\n\nbody")
    with pytest.raises(ValueError, match="without boundary"):
        parse_eml(b"Content-Type: multipart/mixed\n\nbody")
    with pytest.raises(ValueError, match="boundary never matched"):
        parse_eml(b'Content-Type: multipart/mixed; boundary="Q"\n\nno delim')
    with pytest.raises(NotImplementedError):
        parse_eml(b"Content-Transfer-Encoding: uuencode\n\nbody")


def test_mbox_roundtrip_with_stuffing():
    msgs = [
        b"From: x@y\nSubject: s\n\nFrom the start\n>From quoted\nbody\n",
        b"From: z@w\nSubject: t\n\nplain\n",
    ]
    assert parse_mbox(build_mbox(msgs)) == msgs
    with pytest.raises(ValueError, match="not an mbox"):
        parse_mbox(b"no separator here")


def test_frame_quarantines_per_message(spark):
    good = b"From: corpus-bot-1@example.org\nSubject: ok\n\nfine\n"
    bad = b"From: corpus-bot-2@example.org\nContent-Transfer-Encoding: uuencode\n\nxx\n"
    blob = build_mbox([good, bad])
    df = spark.createDataFrame(
        pd.DataFrame({"source": ["s://a.mbox"], "content": [bytearray(blob)]})
    )
    rows = parse_mbox_frame(df).collect()
    ok = [r for r in rows if r["parse_err"] is None]
    err = [r for r in rows if r["parse_err"] is not None]
    assert len(ok) == 1 and ok[0]["text"] == "fine" and ok[0]["msg_index"] == 0
    assert len(err) == 1 and err[0]["msg_index"] == 1


def test_mbox_from_documents_closed_form(spark):
    docs = spark.createDataFrame(
        [(i, f"body text {i}") for i in range(8)], "doc_id long, text string"
    )
    rows = parse_mbox_frame(mbox_from_documents(docs)).collect()
    assert all(r["parse_err"] is None for r in rows)
    by_doc: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["sender"], r["part_order"])):
        by_doc.setdefault(r["sender"], []).append(r)
    for i in range(8):
        parts = by_doc[f"corpus-bot-{i}@example.org"]
        assert parts[0]["subject"] == f"Issue {i}"
        assert parts[0]["content_type"] == "text/plain"
        assert parts[0]["text"] == f"body text {i}"
        if i % 2 == 0:
            assert parts[1]["content_type"] == "text/html"
            assert parts[1]["text"] == f"<p>body text {i}</p>"
        else:
            assert len(parts) == 1
