"""S6/S7 render + outbound sinks: HTML document rendering, stdlib MIME
composition with the can_send guard, and the parquet outbox sink —
mirrors cerberus/models/invoice.py:181-209,299-313 minus the stubbed
PDF rasterizer / SMTP transport."""

from email import policy
from email.parser import BytesParser

import pyarrow.parquet as pq
import pytest
import ray.data as rd

from cerberus_ray.crm import render as R
from cerberus_ray.crm.fixtures import make_crm_tables


@pytest.fixture(scope="module")
def tables(ray_session):
    t, _ = make_crm_tables()
    return t


def test_render_invoices_one_doc_per_invoice(tables):
    out = (R.render_invoices(rd.from_arrow(tables["invoices"]),
                             rd.from_arrow(tables["charges"]))
           .to_pandas().sort_values("invoice_id").reset_index(drop=True))
    assert len(out) == tables["invoices"].num_rows
    inv2 = out[out["invoice_id"] == "2"].iloc[0]
    assert inv2["name"] == "INV-002"                 # invoice.py:127-128
    assert "<h1" in inv2["html"] and "Total:" in inv2["html"]
    assert inv2["n_chars"] == len(inv2["html"])
    # an invoice with charge lines renders one table row per line
    charges = tables["charges"].to_pandas()
    with_lines = charges[charges["invoice_id"].notna()
                         & (charges["state"] != "void")]
    if len(with_lines):
        k = str(int(with_lines["invoice_id"].iloc[0]))
        n_lines = (with_lines["invoice_id"].astype(int).astype(str) == k).sum()
        html = out[out["invoice_id"] == k]["html"].iloc[0]
        assert html.count("<tr>") == n_lines


def test_render_deterministic(tables):
    a = (R.render_invoices(rd.from_arrow(tables["invoices"]),
                           rd.from_arrow(tables["charges"]))
         .to_pandas().sort_values("invoice_id").reset_index(drop=True))
    b = (R.render_invoices(rd.from_arrow(tables["invoices"]),
                           rd.from_arrow(tables["charges"]), n_buckets=3)
         .to_pandas().sort_values("invoice_id").reset_index(drop=True))
    assert a.equals(b)  # bucket count is an execution detail


def test_compose_emails_guard_and_mime(tables):
    rendered = R.render_invoices(rd.from_arrow(tables["invoices"]),
                                 rd.from_arrow(tables["charges"]))
    msgs = (R.compose_emails(rendered, rd.from_arrow(tables["invoices"]),
                             rd.from_arrow(tables["customers"]))
            .to_pandas().sort_values("invoice_id").reset_index(drop=True))
    customers = tables["customers"].to_pandas()
    invoices = tables["invoices"].to_pandas()
    ok_cust = set(customers[(customers["invoice_email"].fillna("") != "")
                            & ~customers["last_name"].fillna("")
                              .str.contains("&")]["customer_id"])
    expect = {str(int(i)) for i, c in zip(invoices["invoice_id"],
                                          invoices["customer_id"])
              if c in ok_cust}
    assert set(msgs["invoice_id"]) == expect      # can_send guard exact
    m = msgs.iloc[0]
    parsed = BytesParser(policy=policy.default).parsebytes(m["rfc822"])
    assert parsed["Subject"].startswith("Invoice INV-")
    # the parser normalizes display-name spacing; compare the address
    assert "admin@stretchtheirlegs.co.uk" in str(parsed["From"])
    assert str(parsed["From"]).startswith("Stretch there legs - Accounts")
    assert parsed["To"] == m["to"]
    parts = list(parsed.walk())
    ctypes = [p.get_content_type() for p in parts]
    assert "text/plain" in ctypes and "text/html" in ctypes
    att = [p for p in parts if p.get_filename()]
    assert att and att[0].get_filename().endswith(".pdf")
    assert att[0].get_content().startswith(b"%PDF-FAKE-RASTER")


def test_rasterize_strict_raises():
    with pytest.raises(NotImplementedError):
        R.rasterize_stub("<html/>", strict=True)


def test_outbox_sink_roundtrip(tables, tmp_path):
    rendered = R.render_invoices(rd.from_arrow(tables["invoices"]),
                                 rd.from_arrow(tables["charges"]))
    msgs = R.compose_emails(rendered, rd.from_arrow(tables["invoices"]),
                            rd.from_arrow(tables["customers"]))
    d = str(tmp_path / "outbox")
    n_files = R.write_outbox(msgs, d)
    assert n_files >= 1
    back = pq.read_table(d)
    assert back.num_rows == msgs.count()
    assert set(back.column_names) >= {"invoice_id", "to", "rfc822"}
