"""Parity against the reference's OWN saved pages and committed goldens —
not synthetic analogs (VERDICT r1 task 2).

The strongest correctness evidence available: the engine must reproduce
the reference's committed golden JSON on the reference's real fixture page
(field-exact for every JSON-carried field), degrade gracefully on its
bot-challenge error fixtures, and extract real data from its samsclub
snapshots. Fixtures live read-only under /root/reference/.

``remaining_credits`` is exempt everywhere: it is the scraping account's
runtime balance (bestbuy_detail.json carries 6066207.5), not page content.
"""

from __future__ import annotations

import json
import os
import re

import pytest

from html_parser_spark.job.pipeline import _extract_one

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not mounted")


def _run(path: str, url: str) -> dict:
    with open(path, "rb") as f:
        return _extract_one(url, f.read())


# -- bestbuy: real page ↔ committed golden, field-exact ----------------------

BB_HTML = f"{REF}/bestbuy/bestbuy_detail_2025-02-27_16-05-10.html"
BB_GOLD = f"{REF}/bestbuy/bestbuy_detail.json"


def test_bestbuy_real_page_matches_committed_golden():
    gold = json.load(open(BB_GOLD))
    out = _run(BB_HTML, gold["url"])
    assert out["status"] == "ok" and out["error"] is None
    assert out["profile"] == "escaped-component-detail"
    env = json.loads(out["envelope"])
    for k in ("success", "url", "result_count"):
        assert env[k] == gold[k], k
    d, gd = env["detail"], gold["detail"]
    for k in gd:  # every golden field, exact — incl. price, ids, variants,
        # specs, the double-space in the name, and category urls
        assert d.get(k) == gd[k], (k, d.get(k), gd[k])


def test_bestbuy_golden_covers_all_fields():
    """The comparison above is only meaningful if the golden actually pins
    the JSON-carried fields — guard against a silently-shrunk golden."""
    gd = json.load(open(BB_GOLD))["detail"]
    assert {"name", "brand", "price", "product_id", "rating",
            "total_reviews", "images", "categories", "description",
            "product_features", "model_no", "specifications"} <= set(gd)


# -- walmart SERP: two real page ↔ committed golden pairs, field-exact -------

SERP_PAIRS = [("walmart_mustard.html", "walmart-mustard.json"),
              ("walmart_search.html", "walmart_search.json")]
# walmart_mustard_page_2.html is NOT paired with walmart_search_page_2.json:
# that html's SSR payload embeds page-1 items (first usItemId 14089343,
# aggregatedCount 4772) while the golden was captured from a later crawl
# (first 121192897, count 4775) — verified unpairable, so excluded.


@pytest.mark.parametrize("hf,gf", SERP_PAIRS)
def test_walmart_serp_real_page_matches_committed_golden(hf, gf):
    gold = json.load(open(f"{REF}/walmart/{gf}"))
    out = _run(f"{REF}/walmart/{hf}", "https://www.walmart.com/search")
    assert out["status"] == "ok" and out["profile"] == "nextdata-serp"
    env = json.loads(out["envelope"])
    for k in gold:
        if k == "remaining_credits":
            continue  # account runtime balance, not page content
        assert env.get(k) == gold[k], (
            k, str(env.get(k))[:300], str(gold[k])[:300])
    # all 50 results, every field (incl. rollback pricing, variant maps,
    # delivery-date coalescing) — asserted via the full-envelope equality
    assert env["result_count"] == gold["result_count"] == 50


# -- walmart: bot-challenge error fixtures must degrade, never fail ----------

@pytest.mark.parametrize("name", ["walmart_detail_error_1",
                                  "walmart_detail_error_2"])
def test_walmart_error_fixture_lands_degraded(name):
    """These two pages crash the reference (walmart-2:56 does
    ``json_data_list[0].get(...)`` on a list-shaped ld+json blob). Our twin
    must surface them as a DEGRADED row — data still extracted from
    __NEXT_DATA__, job never fails (north_rule)."""
    out = _run(f"{REF}/walmart/{name}.html", "https://www.walmart.com/ip/x/1")
    assert out["status"] == "degraded"
    assert out["profile"] == "nextdata-detail"
    assert "ld+json" in out["error"]
    env = json.loads(out["envelope"])  # graceful: partial data retained
    assert env["detail"]["name"]


# -- samsclub: real snapshots extract through the redux profile --------------

SAMSCLUB_SNAPSHOTS = [
    "samsclub_detail_2025-03-20_13-27-54.html",
    "samsclub_detail_2025-03-20_13-31-07.html",
    "samsclub_detail_2025-03-24_19-00-02.html",
]


@pytest.mark.parametrize("name", SAMSCLUB_SNAPSHOTS)
def test_samsclub_snapshot_structure(name):
    """Golden-structure check (no per-snapshot committed JSON exists in the
    reference): envelope shape per parse_samsclub.py:225-232,470-472 and
    the core JSON-carried fields present with the right types."""
    out = _run(f"{REF}/1.samsclub/{name}", "https://www.samsclub.com/p/x/1")
    assert out["status"] == "ok", out["error"]
    assert out["profile"] == "redux-detail"
    env = json.loads(out["envelope"])
    assert list(env.keys()) == ["success", "url", "result_count", "detail",
                                "remaining_credits"]
    assert env["success"] is True and env["result_count"] == 1
    d = env["detail"]
    assert isinstance(d["name"], str) and d["name"]
    assert isinstance(d["brand"], str) and d["brand"]
    assert isinstance(d["price"], (int, float)) and d["price"] > 0
    assert isinstance(d["images"], list) and d["images"]
    assert d["sku_id"] and d["item_no"]
    # some snapshots carry no manufacturingInfo.specification fragment
    assert d["specifications"] is None or isinstance(d["specifications"], list)


# -- other real-page families: profile dispatch + core-field extraction -----

def test_costco_real_pages_extract():
    """costco_{1..4}.html → inline-js profile with real scalar carves.

    Price/pid are cross-checked against an INDEPENDENT regex pull straight
    from the page bytes (the same literals parse_costco.py:49-63 carves),
    so the extractor's values are pinned to page content, not to itself."""
    import re as _re
    for i in (1, 2, 3, 4):
        page = open(f"{REF}/costco/costco_{i}.html", encoding="utf-8",
                    errors="replace").read()
        out = _run(f"{REF}/costco/costco_{i}.html",
                   f"https://www.costco.com/x.product.{i}.html")
        assert out["profile"] == "inline-js-detail" and out["status"] == "ok"
        d = json.loads(out["envelope"])["detail"]
        assert d["name"] and isinstance(d["price"], (int, float)), (i, d)
        m = _re.search(r"priceMax\s*:\s*'(.*?)'", page)
        if m and m.group(1):
            assert d["price"] == float(m.group(1).replace(",", "")), i
        m = _re.search(r"\bpid\s*:\s*'(.*?)'", page)
        if m and m.group(1):
            assert d["product_id"] == m.group(1), i


def test_tesco_real_page_extracts():
    out = _run(f"{REF}/prev/tesco_detail.html",
               "https://www.tesco.com/groceries/p/1")
    assert out["profile"] == "discover-detail" and out["status"] == "ok"
    d = json.loads(out["envelope"])["detail"]
    assert d["name"] == "Tetley 240 Tea Bags 750G"
    assert d["price"] == 4.99 and d["currency"] == "GBP"
    assert d["gtin"] and d["tpnb"] and d["tpnc"]
    assert d["image_url"] and d["image_url"].startswith("https://")
    assert d["images"] is None  # Apollo object is NOT a url list — never leak


# -- bedbathbeyond: golden ↔ its two pairable committed pages, field-exact ---

BBB_GOLD = f"{REF}/bedbathbeyond/first-example.json"
BBB_PAGES = ["bedbathbeyond_detail_2024-12-19_14-50-32.html",
             "bedbathbeyond_detail_2024-12-18_16-28-22.html"]
# Two golden detail keys carry documented drift and are pinned by evidence
# instead of equality (VERDICT r2 task 3 allows "documented unpairability
# proof of the walmart_mustard_page_2 standard" per field):
#  - description: CONTENT drift — the golden's 241-char text is a strict
#    prefix of both committed pages' jsonLdDescription/description HTML
#    (the product copy gained a third sentence between the golden's crawl
#    and the page snapshots); no parser can emit the golden text from
#    these pages. The prefix relation is asserted below as the proof.
#  - review_aspects[*].verified_purchase: VINTAGE drift — the golden pins
#    null for all 10 reviews while both pages carry
#    badges.is_verified_buyer=true for all 10 (the reference's many
#    '= None  # TODO' placeholders show the vintage pattern; the badge
#    read was added later). All other aspect fields are asserted exact.


@pytest.mark.parametrize("page", BBB_PAGES)
def test_bedbathbeyond_real_page_matches_committed_golden(page):
    gold = json.load(open(BBB_GOLD))
    out = _run(f"{REF}/bedbathbeyond/{page}", gold["product_url"])
    assert out["status"] == "ok" and out["profile"] == "nextprops-detail"
    env = json.loads(out["envelope"])
    for k in ("success", "product_url", "result_count"):
        assert env[k] == gold[k], k
    d, gd = env["detail"], gold["detail"]
    for k in gd:
        if k in ("description", "review_aspects"):
            continue  # documented drift, pinned below
        assert d.get(k) == gd[k], (k, str(d.get(k))[:200], str(gd[k])[:200])
    # description: content-drift proof — golden is a strict prefix of the
    # page's current copy, so ours must extend it, never diverge from it.
    assert d["description"].startswith(gd["description"])
    assert len(d["description"]) > len(gd["description"])
    # review_aspects: every field exact except the vintage badge read.
    assert len(d["review_aspects"]) == len(gd["review_aspects"]) == 10
    for ra, rg in zip(d["review_aspects"], gd["review_aspects"]):
        for k in rg:
            if k == "verified_purchase":
                assert rg[k] is None and ra[k] is True  # the drift itself
            else:
                assert ra[k] == rg[k], k


def test_bedbathbeyond_golden_covers_all_fields():
    gd = json.load(open(BBB_GOLD))["detail"]
    assert {"name", "brand", "url", "listing_id", "price", "currency",
            "rating", "total_ratings", "shipping_info", "variant",
            "categories", "main_image", "images", "overview",
            "details_table", "variants", "review_aspects"} <= set(gd)


def test_bedbathbeyond_real_pages_extract():
    for name, url in [("123.html", "https://www.bedbathandbeyond.com/p/123"),
                      ("bedbathbeyond_detail_2024-12-18_13-40-11.html",
                       "https://www.bedbathandbeyond.com/p/y")]:
        out = _run(f"{REF}/bedbathbeyond/{name}", url)
        assert out["profile"] == "nextprops-detail" and out["status"] == "ok"
        d = json.loads(out["envelope"])["detail"]
        assert d["name"] and isinstance(d["price"], (int, float))
        assert d["images"] and all(
            i.startswith("https://ak1.ostkcdn.com/images/products/")
            for i in d["images"])  # ref :150 prefix
        assert d["url"] and d["currency"]


def test_mercado_real_serp_extracts():
    out = _run(f"{REF}/prev/mercado_search.html",
               "https://listado.mercadolibre.com.mx/x")
    assert out["profile"] == "css-serp" and out["status"] == "ok"
    env = json.loads(out["envelope"])
    assert env["result_count"] == 50
    r0 = env["results"][0]
    assert r0["name"] and r0["price"] and r0["url"]
    assert "currenty" in r0  # the reference's own typo key (parse_mercado.py)


def test_wayfair_real_detail_pages_extract():
    """The webpack carve must survive real pages' guarded spread-merge
    re-assignments and the HotDeals DOM selectors must hit — on ALL six
    committed detail pages (VERDICT r2 task 7). …12-53-17 is a truncated
    snapshot (its WEBPACK payload stops mid-JSON, 9 unclosed braces, with
    head HTML spliced inside the script element); the reference's bare
    ``except`` (parse_wayfair.py:49-50) logs and proceeds DOM-only, so
    our twin must land status='degraded' with full DOM fields, never
    no_rule."""
    names = ["wayfair_detail_2024-12-08_12-51-54.html",
             "wayfair_detail_2024-12-08_12-53-05.html",
             "wayfair_detail_2024-12-08_12-53-17.html",
             "wayfair_detail_2024-12-08_12-56-31.html",
             "wayfair_detail_one.html", "wayfair_detail_two.html"]
    n_full = 0
    for name in names:
        out = _run(f"{REF}/prev/{name}", "https://www.wayfair.com/p/1")
        assert out["profile"] == "webpack-detail", (name, out["profile"])
        expected = ("degraded" if "12-53-17" in name else "ok")
        assert out["status"] == expected, (name, out["status"], out["error"])
        d = json.loads(out["envelope"])["detail"]
        if d["name"] and d["price"] and d["sku_id"] and d["brand"]:
            n_full += 1
    assert n_full == 6, n_full


def test_wayfair_real_category_page_extracts():
    out = _run(f"{REF}/prev/wayfair_category.html", "https://www.wayfair.com/c")
    assert out["profile"] == "webpack-serp" and out["status"] == "ok"
    env = json.loads(out["envelope"])
    assert env["result_count"] >= 40
    r0 = env["results"][0]
    assert r0["sku"] and r0["name"] and r0["customer_price"]
    assert r0["image_url"] and "resize-h800-w800" in r0["image_url"]


def test_overstock_real_pages_extract():
    """All 9 snapshots: the four carriers live in different scripts —
    the scan must find name/brand/price/listing_id on every page."""
    snaps = [f for f in os.listdir(f"{REF}/overstock") if f.endswith(".html")]
    assert len(snaps) == 9
    for name in snaps:
        out = _run(f"{REF}/overstock/{name}",
                   "https://www.bedbathandbeyond.com/p/x")
        assert out["profile"] == "pixels-detail" and out["status"] == "ok"
        d = json.loads(out["envelope"])["detail"]
        assert d["name"] and d["brand"] and d["listing_id"], name
        assert isinstance(d["price"], (int, float)), name
        assert d["main_image"], name


def _strip_tags(s: str) -> str:
    import html as _html
    return _html.unescape(re.sub(r"<[^>]+>", "", s)).strip()


def test_costco_deep_field_parity():
    """VERDICT r3 task 4: every deep extraction path of parse_costco.py
    pinned on the real pages against INDEPENDENT pulls straight from the
    page bytes — the same carve the reference performs, re-done with
    plain regex/json in this test so the extractor's values are pinned
    to page content, not to itself.

    Paths covered: priceMin → price_listing (:53-55), itemDetailsList →
    images (:125-132), nested products/options arrays → variants with
    base64 prices + variant_options (:283-334), Includes text node
    (:160-164), Features sibling-ul (:167-177), Specifications rows
    (:203-219)."""
    import base64 as _b64
    for i in (1, 2, 3, 4):
        page = open(f"{REF}/costco/costco_{i}.html", encoding="utf-8",
                    errors="replace").read()
        out = _run(f"{REF}/costco/costco_{i}.html",
                   f"https://www.costco.com/x.product.{i}.html")
        d = json.loads(out["envelope"])["detail"]

        # price_listing ← priceMin
        m = re.search(r"priceMin\s*:\s*'(.*?)'", page)
        assert d["price_listing"] == float(m.group(1).replace(",", "")), i

        # images ← the script that carries itemDetailsList
        scripts = re.findall(r"<script[^>]*>(.*?)</script>", page, re.DOTALL)
        idl = next(s for s in scripts if "itemDetailsList" in s)
        want_imgs = re.findall(r"cdn_url:\s*'([^']*)',", idl)
        assert len(want_imgs) >= 3, i
        assert d["images"] == want_imgs, i

        # variants ← var products = [ [ ... ] ] with b64 prices
        vs = next(s for s in scripts if "var products = [" in s)
        prods = json.loads(re.search(
            r"var\s*products\s*=\s*\[\s*(\[.*?\])\s*\]\;", vs,
            re.DOTALL).group(1))
        assert len(d["variants"]) == len(prods) >= 1, i
        for got, raw in zip(d["variants"], prods):
            assert got["part_number"] == raw["partNumber"], i
            assert got["product_url"] == raw["productUrl"], i
            assert got["inventory"] == raw["inventory"], i
            assert got["options"] == raw["options"], i
            for k_ours, k_ref in (("price", "price"),
                                  ("list_price", "listPrice")):
                b = raw.get(k_ref)
                want = (float(_b64.b64decode(b).decode().replace(",", ""))
                        if b else None)
                assert got[k_ours] == want, (i, k_ours, b)

        # variant_options ← var options = [ [ ... ] ], ' → " normalized
        opts = json.loads(re.search(
            r"var\s*options\s*=\s*\[\s*(\[.*?\])\s*\]\;", vs,
            re.DOTALL).group(1).replace("'", '"'))
        if opts:
            assert d["variant_options"] == [
                {"name": o.get("n"), "values": o.get("v")} for o in opts], i
        else:
            assert d["variant_options"] is None, i

        # specifications ← div.row spec-name/value cell pairs
        h3 = re.search(r'<h3 class="section-title">\s*Specifications', page)
        assert h3 is not None, i
        sect = page[h3.start():page.find("<h3", h3.start() + 10)]
        rows = re.findall(
            r'<div class="spec-name[^>]*>(.*?)</div>\s*'
            r'<div[^>]*>([^<]*?)</div>', sect, re.DOTALL)
        want_specs = [{"name": _strip_tags(k), "value": _strip_tags(v)}
                      for k, v in rows]
        assert d["specifications"] == want_specs and len(want_specs) >= 3, i

    # Includes / Features on the page that carries them inside a <p>
    # (costco_3; on costco_1 the blob sits outside any <p>, so the
    # reference's paragraph loop — and ours — correctly yields None).
    page = open(f"{REF}/costco/costco_3.html", encoding="utf-8",
                errors="replace").read()
    out = _run(f"{REF}/costco/costco_3.html",
               "https://www.costco.com/x.product.3.html")
    d = json.loads(out["envelope"])["detail"]
    m = re.search(r"<strong>Includes:</strong>([^<]*)<", page)
    want_includes = [s.strip() for s in _strip_tags(m.group(1)).split(",")]
    assert d["includes"] == want_includes, d["includes"]
    assert not any("Features:" in s for s in d["includes"])  # no leak
    # Features ul items, tag-stripped
    fpos = page.find("<strong>Features:</strong>")
    ul = page[page.find("<ul>", fpos):page.find("</ul>", fpos)]
    want_feats = [_strip_tags(li)
                  for li in re.findall(r"<li>(.*?)</li>", ul, re.DOTALL)]
    assert d["features"] == want_feats and len(want_feats) >= 5

    out1 = _run(f"{REF}/costco/costco_1.html",
                "https://www.costco.com/x.product.1.html")
    assert json.loads(out1["envelope"])["detail"]["includes"] is None


def test_overstock_deep_field_parity():
    """VERDICT r3 task 4: the overstock deep paths pinned on every real
    snapshot against independent pulls — the X1 sectionizer replayed
    VERBATIM from parse_overstock.py:205-229 over the independently
    regex-pulled missingAttributes.description, plus images
    (descendant <img>, https: prefix, query strip, :177-189), overview/
    details_table from the datalayer attributeList (:195-201,232),
    variants from initData productVariants (:240-252) and max_quantity
    (:166). review_aspects/rating come from a PowerReviews NETWORK call
    in the reference (:150-156) — out of scope (S3-S5), pinned None."""
    snaps = sorted(f for f in os.listdir(f"{REF}/overstock")
                   if f.endswith(".html"))
    covered_imgs = covered_feats = 0
    for name in snaps:
        page = open(f"{REF}/overstock/{name}", encoding="utf-8",
                    errors="replace").read()
        out = _run(f"{REF}/overstock/{name}",
                   "https://www.bedbathandbeyond.com/p/x")
        d = json.loads(out["envelope"])["detail"]

        missing = json.loads(re.search(
            r"const\s+missingAttributes\s*=\s*(\{.*?\})\s*const\s+scripts",
            page, re.DOTALL).group(1))
        # --- reference sectionizer, verbatim (:205-229) ---
        features, dimensions, description_new = [], [], ""
        status = "description"
        for line in (missing.get("description") or "").splitlines():
            line = line.strip()
            if line == "":
                continue
            if line.lower() == "features:":
                status = "features"
            elif line.lower() == "dimensions:":
                status = "dimensions"
            elif line.endswith(":"):
                status = "none"
            else:
                if status == "features":
                    features.append(line)
                elif status == "dimensions":
                    dimensions.append(line)
                elif status == "description":
                    description_new += f"{line}\n"
        assert d["description"] == description_new, name
        assert d["features"] == (features or None), name
        assert d["dimensions"] == (dimensions or None), name
        covered_feats += bool(features)

        # --- images: li.media-viewer__item → descendant img ---
        want_imgs = []
        for li in re.findall(
                r'<li class="media-viewer__item.*?</li>', page, re.DOTALL):
            img = re.search(r"<img[^>]*>", li)
            if not img:
                continue
            src = (re.search(r'data-src="([^"]*)"', img.group(0))
                   or re.search(r'\bsrc="([^"]*)"', img.group(0)))
            if src and not src.group(1).startswith("data:"):
                u = src.group(1)
                u = u if u.startswith("http") else "https:" + u
                want_imgs.append(_strip_tags(u.split("?")[0]))
        assert d["images"] == want_imgs, name
        covered_imgs += bool(want_imgs)

        # --- datalayer: overview/details_table, max_quantity ---
        dl = re.findall(
            r"window.salesforce.datalayer.product\s*=\s*(\{.*?\})\;",
            page, re.DOTALL)
        prod = json.loads(dl[1] if len(dl) > 1 else dl[0])
        want_overview = [{"name": a.get("label"), "value": a.get("values")}
                         for a in prod.get("attributeList") or []] or None
        assert d["overview"] == want_overview, name
        assert d["details_table"] == want_overview, name
        inv = prod.get("inventory") or []
        assert d["max_quantity"] == (inv[0].get("quantity")
                                     if inv else None), name

        # --- initData productVariants: variants + variant + listing_id ---
        setup = re.search(
            r'<script[^>]*id="web-pixels-manager-setup"[^>]*>(.*?)</script>',
            page, re.DOTALL).group(1)
        init = json.loads(re.search(
            r'initData:\s*(\{.*?purchasingCompany\"\:null\})\,\}',
            setup, re.DOTALL).group(1))
        pv = init.get("productVariants") or []
        assert len(d["variants"] or []) == len(pv), name
        for got, raw in zip(d["variants"] or [], pv):
            assert got["price"] == (raw.get("price") or {}).get("amount")
            assert got["sku"] == raw.get("sku")
            assert got["id"] == raw.get("id")
            assert got["title"] == (raw.get("product") or {}).get("title")
        if pv:
            assert d["variant"] == {"id": pv[0].get("id")}, name
            assert d["listing_id"] == (pv[0].get("product")
                                       or {}).get("id"), name

        # network-only in the reference — honest None offline
        assert d["review_aspects"] is None and d["rating"] is None, name
    # the corpus must actually exercise the gallery and feature paths
    assert covered_imgs >= 5 and covered_feats >= 1, (covered_imgs,
                                                      covered_feats)


def _wrap_script(payload: str, script_id: str, url: str) -> bytes:
    return (f'<html><head><link rel="canonical" href="{url}"></head><body>'
            f'<script id="{script_id}" type="application/json">{payload}'
            "</script></body></html>").encode()


def test_samsclub_saved_redux_payload_extracts():
    """The reference's committed redux-state fixture (json_data.json) fed
    through the engine — real payload, known product."""
    payload = open(f"{REF}/1.samsclub/json_data.json", encoding="utf-8").read()
    out = _extract_one(
        "https://www.samsclub.com/p/x",
        _wrap_script(payload, "tb-djs-wml-redux-state",
                     "https://www.samsclub.com/p/x"))
    assert out["profile"] == "redux-detail" and out["status"] == "ok"
    d = json.loads(out["envelope"])["detail"]
    assert d["name"] == "Energizer AAA Ultimate Lithium Batteries, 18 pk."
    assert d["brand"] == "Energizer" and d["price"] == 34.98
    assert d["sku_id"] == "sku21916255" and d["item_no"] == "980044326"


def test_bedbathbeyond_saved_nextdata_payloads_extract():
    """All five committed NEXT_DATA dumps extract through nextprops."""
    for f in ("next_data", "next_data_1", "next_data_2", "next_data_3"):
        payload = open(f"{REF}/bedbathbeyond/{f}.json",
                       encoding="utf-8").read()
        out = _extract_one(
            "https://www.bedbathandbeyond.com/p/x",
            _wrap_script(payload, "__NEXT_DATA__",
                         "https://www.bedbathandbeyond.com/p/x"))
        assert out["profile"] == "nextprops-detail", f
        assert out["status"] == "ok", f
        d = json.loads(out["envelope"])["detail"]
        assert d["name"] and isinstance(d["price"], (int, float)), f


def test_homedepot_raw_json_extracts():
    """Real CA search dump → apijson-serp rows with reference url prefix
    (parse_homedepot_json.py:47)."""
    raw = open(f"{REF}/homedepot/homedepot_raw_ca_search.json", "rb").read()
    out = _extract_one("https://www.homedepot.ca/api/search", raw)
    assert out["profile"] == "apijson-serp" and out["status"] == "ok"
    env = json.loads(out["envelope"])
    assert env["result_count"] == 40
    r0 = env["results"][0]
    assert r0["url"].startswith("https://www.homedepot.ca/")
    assert r0["id"] and r0["name"] and r0["brand"] and r0["currency"] == "CAD"
    assert isinstance(r0["price"], (int, float))


def test_tesco_reviews_raw_json_normalizes():
    """Raw reviews-API body (prev/tesco_reviews_raw.json) → flat dict per
    parse_tesco.py, value-exact against the real fixture content."""
    raw = open(f"{REF}/prev/tesco_reviews_raw.json", "rb").read()
    out = _extract_one("https://api.tesco.example/reviews", raw)
    assert out["profile"] == "apijson-reviews" and out["status"] == "ok"
    env = json.loads(out["envelope"])
    src = json.load(open(f"{REF}/prev/tesco_reviews_raw.json"))
    rv = src[0]["data"]["reviews"]
    assert env["offset"] == rv["info"]["offset"]
    assert env["total"] == rv["info"]["total"]
    assert env["product_tpnb"] == rv["product"]["tpnb"]
    assert env["overall_rating"] == rv["stats"]["overallRating"]
    assert len(env["review_list"]) == len(rv["entries"])
    first = env["review_list"][0]
    assert first["review_id"] == rv["entries"][0]["reviewId"]
    assert "syndication_soure_name" in first  # the reference's typo key


def test_all_samsclub_snapshots_extract_without_failure():
    """Every one of the reference's 17 snapshots must produce a status row
    (ok or degraded — never a crash)."""
    snaps = [f for f in os.listdir(f"{REF}/1.samsclub")
             if f.startswith("samsclub_detail_") and f.endswith(".html")]
    assert len(snaps) >= 15
    statuses = {}
    for name in snaps:
        out = _run(f"{REF}/1.samsclub/{name}", "https://www.samsclub.com/p/x")
        statuses[name] = (out["profile"], out["status"])
    assert all(p == "redux-detail" and s in ("ok", "degraded")
               for p, s in statuses.values()), statuses
    n_ok = sum(1 for _, s in statuses.values() if s == "ok")
    assert n_ok >= 14, statuses
