"""Render + outbound-message sinks — the S6/S7 surfaces re-expressed
Ray-Data-first.

Reference behavior: an invoice renders through an HTML template to PDF
(cerberus/models/invoice.py:299-313 get_pdf via xhtml2pdf over
templates/cerberus/invoice.html) and sends as a multipart email — text
body, MJML-HTML alternative, PDF attachment — guarded by ``can_send()``
(invoice.py:181-209). The engine analogue:

- HTML rendering is REAL (deterministic template over the invoice row +
  its charge lines, same fields the reference template binds: name
  ``INV-{pk:03}`` per invoice.py:127-128, line items, adjustment, total).
- MIME composition is REAL (stdlib ``email.message.EmailMessage``: text
  body + text/html alternative + rendered-document attachment,
  serialized RFC-822 bytes; subject string from invoice.py:194).
- Only the two steps that need absent infrastructure are stubbed: PDF
  rasterization (xhtml2pdf; ``rasterize_stub`` emits a clearly-marked
  fake payload, ``strict=True`` raises) and SMTP delivery (the outbox
  sink persists the RFC-822 bytes a transport would send) — swapping in
  the real rasterizer/transport changes one function each.

Ray shape: invoices ∪ charge lines flow through the hash-bucketed keyed
exchange (stages/keyed_window) — one render call per BUCKET, whole
invoices per call, nothing collected on the driver; the sink is
partitioned parquet with a binary payload column (resumable like every
other sink here).
"""

from __future__ import annotations

from email.message import EmailMessage

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.keyed_window import keyed_apply

#: deterministic single-file analogue of templates/cerberus/invoice.html
_DOC_TMPL = """<html><head><title>{name}</title></head><body>
<h1 class="inv">{name}</h1>
<p>Customer: {customer}</p>
<table class="inv">{rows}</table>
<p>Adjustment: {adjustment:.2f}</p>
<p>Total: {total:.2f}</p>
</body></html>"""

_ROW_TMPL = "<tr><td>{name}</td><td>{qty}</td><td>{amount:.2f}</td></tr>"

#: literal subject/sender strings from invoice.py:193-198 — the contract
SUBJECT_TMPL = "Invoice {name} - Stretch there legs"
FROM_ADDR = "Stretch there legs - Accounts<admin@stretchtheirlegs.co.uk>"
REPLY_TO = "Stef <stef@stretchtheirlegs.co.uk>"


def invoice_name(invoice_id: int) -> str:
    """``INV-{pk:03}`` (invoice.py:127-128)."""
    return f"INV-{int(invoice_id):03}"


def render_invoices(invoices_ds, charges_ds, *, n_buckets: int = 16):
    """→ Dataset(invoice_id, name, html, n_chars): HTML document per
    invoice with its non-void charge lines. Keyed exchange: charge-line
    rows union invoice rows, bucketed on the invoice key."""

    def lines(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(pc.is_valid(b["invoice_id"]),
                             pc.invert(pc.equal(b["state"], "void"))))
        amount = pc.multiply(pc.cast(t["line"], pa.float64()),
                             pc.cast(t["quantity"], pa.float64()))
        n = t.num_rows
        return pa.Table.from_arrays(
            [pc.cast(t["invoice_id"], pa.string()),
             pc.cast(t["name"], pa.string()),
             pc.cast(t["quantity"], pa.float64()), amount,
             pa.nulls(n, pa.float64()), pa.nulls(n, pa.float64()),
             pa.nulls(n, pa.string()),
             pa.array(["line"] * n, type=pa.string())],
            names=["k", "item", "qty", "amount", "adjustment", "total",
                   "customer", "src"])

    def heads(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.Table.from_arrays(
            [pc.cast(b["invoice_id"], pa.string()), pa.nulls(n, pa.string()),
             pa.nulls(n, pa.float64()), pa.nulls(n, pa.float64()),
             pc.cast(b["adjustment"], pa.float64()),
             pc.cast(b["total"], pa.float64()),
             pc.cast(b["customer_id"], pa.string()),
             pa.array(["head"] * n, type=pa.string())],
            names=["k", "item", "qty", "amount", "adjustment", "total",
                   "customer", "src"])

    def render(d: pd.DataFrame) -> pd.DataFrame:
        ln = d.loc[d["src"] == "line"].sort_values(["k", "item"])
        hd = d.loc[d["src"] == "head"].drop_duplicates("k")
        if not len(hd):
            return pd.DataFrame({
                "invoice_id": pd.Series(dtype=object),
                "name": pd.Series(dtype=object),
                "html": pd.Series(dtype=object),
                "n_chars": pd.Series(dtype="int64")})
        rows_by_k = {
            k: "".join(_ROW_TMPL.format(name=i, qty=int(q), amount=a)
                       for i, q, a in zip(g["item"], g["qty"], g["amount"]))
            for k, g in ln.groupby("k", sort=False)}
        out = {"invoice_id": [], "name": [], "html": [], "n_chars": []}
        for k, adj, tot, cust in zip(hd["k"], hd["adjustment"], hd["total"],
                                     hd["customer"]):
            name = invoice_name(int(k))
            html = _DOC_TMPL.format(name=name, customer=cust,
                                    rows=rows_by_k.get(k, ""),
                                    adjustment=adj, total=tot)
            out["invoice_id"].append(k)
            out["name"].append(name)
            out["html"].append(html)
            out["n_chars"].append(len(html))
        return pd.DataFrame(out)

    c = charges_ds.map_batches(lines, batch_format="pyarrow",
                               zero_copy_batch=True)
    h = invoices_ds.map_batches(heads, batch_format="pyarrow",
                                zero_copy_batch=True)
    return keyed_apply(c.union(h), "k", render, n_buckets=n_buckets)


def rasterize_stub(html: str, *, strict: bool = False) -> bytes:
    """PDF rasterization stub (the xhtml2pdf step, invoice.py:299-313).
    ``strict=True`` raises — the contract a real deployment fills; the
    fake is a clearly-marked deterministic payload so the email plumbing
    downstream is fully exercised."""
    if strict:
        raise NotImplementedError(
            "PDF rasterization requires xhtml2pdf/weasyprint, absent here; "
            "swap rasterize_stub for the real renderer")
    return b"%PDF-FAKE-RASTER\n" + html.encode()


def compose_emails(rendered_ds, invoices_ds, customers_ds, *,
                   n_buckets: int = 16, strict_pdf: bool = False):
    """→ Dataset(invoice_id, to, subject, n_bytes, rfc822: binary).

    REAL stdlib MIME composition per invoice — text body + text/html
    alternative + rendered-document attachment, the invoice.py:193-208
    shape. The ``can_send`` guard (invoice.py:116-117: customer has an
    invoice email and no issues — customer.py:130-140) is applied with
    TWO keyed exchanges — rendered⋈invoices on the invoice key to attach
    customer_id, then ⋈customers on the customer key to attach the
    guarded email — so neither the invoice stream (fact-sized) nor the
    customer stream is ever held on the driver or broadcast. Guarded-out
    invoices emit no message. Delivery (SMTP) is out of scope: the
    output is the serialized RFC-822 byte stream a transport would
    send. MIME serialization is inherently per-message work, ∝ the
    output message count (same as the reference's send loop)."""

    # exchange 1: rendered docs ∪ invoice (id, customer_id) on invoice key
    def r_side(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.Table.from_arrays(
            [pc.cast(b["invoice_id"], pa.string()),
             pc.cast(b["name"], pa.string()), pc.cast(b["html"], pa.string()),
             pa.nulls(n, pa.string()),
             pa.array(["r"] * n, type=pa.string())],
            names=["k", "name", "html", "cust", "src"])

    def i_side(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.Table.from_arrays(
            [pc.cast(b["invoice_id"], pa.string()), pa.nulls(n, pa.string()),
             pa.nulls(n, pa.string()), pc.cast(b["customer_id"], pa.string()),
             pa.array(["i"] * n, type=pa.string())],
            names=["k", "name", "html", "cust", "src"])

    def attach_cust(d: pd.DataFrame) -> pd.DataFrame:
        r = d.loc[d["src"] == "r", ["k", "name", "html"]]
        i = d.loc[d["src"] == "i", ["k", "cust"]].drop_duplicates("k")
        m = r.merge(i, on="k")
        return m.rename(columns={"k": "invoice_id"})

    with_cust = keyed_apply(
        rendered_ds.map_batches(r_side, batch_format="pyarrow",
                                zero_copy_batch=True)
        .union(invoices_ds.map_batches(i_side, batch_format="pyarrow",
                                       zero_copy_batch=True)),
        "k", attach_cust, n_buckets=n_buckets)

    # exchange 2: (invoice, customer_id, doc) ∪ guarded customer emails
    # on the customer key; compose MIME inside the bucket kernel
    def d_side(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.Table.from_arrays(
            [pc.cast(b["cust"], pa.string()),
             pc.cast(b["invoice_id"], pa.string()),
             pc.cast(b["name"], pa.string()), pc.cast(b["html"], pa.string()),
             pa.nulls(n, pa.string()),
             pa.array(["d"] * n, type=pa.string())],
            names=["k", "invoice_id", "name", "html", "email", "src"])

    def c_side(b: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.invert(pc.equal(pc.fill_null(b["invoice_email"], ""), "")),
            pc.invert(pc.match_substring(pc.fill_null(b["last_name"], ""),
                                         "&")))
        t = b.filter(ok)
        n = t.num_rows
        return pa.Table.from_arrays(
            [pc.cast(t["customer_id"], pa.string()), pa.nulls(n, pa.string()),
             pa.nulls(n, pa.string()), pa.nulls(n, pa.string()),
             pc.cast(t["invoice_email"], pa.string()),
             pa.array(["c"] * n, type=pa.string())],
            names=["k", "invoice_id", "name", "html", "email", "src"])

    def compose(d: pd.DataFrame) -> pd.DataFrame:
        docs = d.loc[d["src"] == "d", ["k", "invoice_id", "name", "html"]]
        cust = d.loc[d["src"] == "c", ["k", "email"]].drop_duplicates("k")
        m = docs.merge(cust, on="k")  # inner = the can_send guard
        out = {"invoice_id": [], "to": [], "subject": [], "n_bytes": [],
               "rfc822": []}
        for k, name, html, to in zip(m["invoice_id"], m["name"], m["html"],
                                     m["email"]):
            msg = EmailMessage()
            msg["Subject"] = SUBJECT_TMPL.format(name=name)
            msg["From"] = FROM_ADDR
            msg["Reply-To"] = REPLY_TO
            msg["To"] = to
            msg.set_content(f"Please find attached invoice {name}.\n")
            msg.add_alternative(html, subtype="html")
            msg.add_attachment(rasterize_stub(html, strict=strict_pdf),
                               maintype="application", subtype="pdf",
                               filename=f"{name}.pdf")
            raw = msg.as_bytes()
            out["invoice_id"].append(k)
            out["to"].append(to)
            out["subject"].append(str(msg["Subject"]))
            out["n_bytes"].append(len(raw))
            out["rfc822"].append(raw)
        return pd.DataFrame({
            "invoice_id": pd.Series(out["invoice_id"], dtype=object),
            "to": pd.Series(out["to"], dtype=object),
            "subject": pd.Series(out["subject"], dtype=object),
            "n_bytes": pd.Series(out["n_bytes"], dtype="int64"),
            "rfc822": pd.Series(out["rfc822"], dtype=object)})

    return keyed_apply(
        with_cust.map_batches(d_side, batch_format="pyarrow")
        .union(customers_ds.map_batches(c_side, batch_format="pyarrow",
                                        zero_copy_batch=True)),
        "k", compose, n_buckets=n_buckets)


def write_outbox(messages_ds, out_dir: str):
    """Partitioned parquet outbox sink (binary rfc822 payloads) — the
    resumable-sink shape every other writer here uses; a transport would
    consume and delete. Returns the file count."""
    messages_ds.write_parquet(out_dir)
    import os

    return len([f for f in os.listdir(out_dir) if f.endswith(".parquet")])
