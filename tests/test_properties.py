"""Property-based tests (hypothesis): serializer round-trips, ID-kernel
parity, LocalModel invariants, quality-op bounds.  No Spark session —
these target the pure kernels, so hypothesis can run many examples fast."""

import string

from hypothesis import given, settings, strategies as st

from versa_spark.ids import simple_hashstring
from versa_spark.iriref import I
from versa_spark.kg.ids_vec import simple_hashstring_batch
from versa_spark.local import LocalModel
from versa_spark.serial import ntriples

# -- ID kernel parity ---------------------------------------------------

text_strategy = st.text(min_size=0, max_size=300)


@settings(max_examples=300, deadline=None)
@given(st.lists(text_strategy, min_size=1, max_size=20))
def test_vectorized_ids_match_scalar(texts):
    assert simple_hashstring_batch(texts) == [
        simple_hashstring(t) for t in texts]


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_id_shape(t):
    h = simple_hashstring(t)
    assert len(h) == 11
    assert all(c in string.ascii_letters + string.digits + "-_" for c in h)


# -- NTriples round-trip -------------------------------------------------

iri_strategy = st.from_regex(r"http://x\.org/[a-zA-Z0-9_\-]{1,20}",
                             fullmatch=True)
# NT literals here exclude quote/backslash (the reference's regex parser
# does not unescape, ntriples.py:29) and all control chars (raw controls
# are invalid NT; both engines split lines on \x1c-\x1e etc.)
literal_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc"),
                           blacklist_characters='"\\\u2028\u2029\x85'),
    min_size=0, max_size=60)


@settings(max_examples=100, deadline=None)
@given(st.lists(
    st.tuples(iri_strategy, iri_strategy,
              st.one_of(iri_strategy.map(I), literal_strategy)),
    min_size=0, max_size=20))
def test_ntriples_roundtrip(triples):
    quads = [(I(s), I(p), o, {}) for (s, p, o) in triples]
    text = ntriples.write_string(quads)
    back = ntriples.parse(text)
    def key(qs):
        return sorted((str(o), str(r), str(t), isinstance(t, I))
                      for (o, r, t, _a) in qs)
    # parse dedups exact repeats — compare as sets
    assert set(key(back)) == set(key(quads))


# -- LocalModel invariants ----------------------------------------------

quad_strategy = st.tuples(
    iri_strategy, iri_strategy, literal_strategy,
    st.dictionaries(st.sampled_from(["@lang", "@type", "k"]),
                    st.text(max_size=10), max_size=2))


@settings(max_examples=100, deadline=None)
@given(st.lists(quad_strategy, max_size=30))
def test_localmodel_dedup_idempotent(quads):
    m = LocalModel()
    for q in quads:
        m.add(*q)
    n = len(m)
    for q in quads:          # re-adding everything changes nothing
        m.add(*q)
    assert len(m) == n
    m2 = LocalModel(list(m))  # rebuild from own contents
    assert len(m2) == n


@settings(max_examples=100, deadline=None)
@given(st.lists(quad_strategy, max_size=30))
def test_localmodel_match_is_filter(quads):
    m = LocalModel()
    for q in quads:
        m.add(*q)
    for (o, r, t, a) in list(m)[:5]:
        hits = list(m.match(o, r))
        assert all(ho == o and hr == r for (ho, hr, _t, _a) in hits)
        assert any(ht == t for (_o, _r, ht, _a) in hits)


# -- fingerprint plaintext determinism -----------------------------------

pair_strategy = st.tuples(iri_strategy, st.text(min_size=1, max_size=30))


@settings(max_examples=100, deadline=None)
@given(st.lists(pair_strategy, min_size=1, max_size=6))
def test_resource_id_order_insensitive(pairs):
    from versa_spark.ids import resource_id
    a = resource_id("http://x.org/T", pairs)
    b = resource_id("http://x.org/T", list(reversed(pairs)))
    assert a == b            # canonical sort makes order irrelevant
    if any(v != pairs[0][1] for (_k, v) in pairs) or len({k for k, _ in pairs}) > 1:
        c = resource_id("http://x.org/OtherT", pairs)
        assert c != a        # type participates in the fingerprint


@given(st.integers(1, 12), st.integers(1, 8),
       st.lists(st.integers(0, 255), min_size=1, max_size=96))
@settings(max_examples=60, deadline=None)
def test_pgm_roundtrip_property(w, h, px):
    """Any w×h byte raster survives encode_pgm → decode_pgm_ppm exactly."""
    from versa_spark import multimodal
    px = (px * ((w * h) // len(px) + 1))[:w * h]
    ww, hh, arr = multimodal.decode_pgm_ppm(multimodal.encode_pgm(w, h, px))
    assert (ww, hh) == (w, h) and arr.ravel().tolist() == px


@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=256),
       st.sampled_from([1000, 8000, 16000, 44100]))
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(samples, rate):
    """Any PCM-16 sample vector survives encode_wav → decode_wav exactly,
    including the int16 extremes."""
    from versa_spark import multimodal
    got_rate, back, n_ch = multimodal.decode_wav(
        multimodal.encode_wav(samples, rate))
    assert got_rate == rate and n_ch == 1 and back.tolist() == samples
