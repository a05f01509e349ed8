"""LocalModel parity with the reference in-memory driver
(/root/reference/test/py/test_memory.py:20-91): match with attr filters,
ordered insertion, removal, index access, copy."""

from versa_spark.local import LocalModel

RELS_1 = [
    ("http://copia.ogbuji.net", "http://purl.org/dc/elements/1.1/creator",
     "Uche Ogbuji", {"@context": "http://copia.ogbuji.net#_metadata"}),
    ("http://copia.ogbuji.net", "http://purl.org/dc/elements/1.1/title",
     "Copia", {"@context": "http://copia.ogbuji.net#_metadata",
               "@lang": "en"}),
    ("http://uche.ogbuji.net", "http://purl.org/dc/elements/1.1/creator",
     "Uche Ogbuji", {"@context": "http://uche.ogbuji.net#_metadata"}),
    ("http://uche.ogbuji.net", "http://purl.org/dc/elements/1.1/title",
     "Uche's home", {"@context": "http://uche.ogbuji.net#_metadata",
                     "@lang": "en"}),
    ("http://uche.ogbuji.net", "http://purl.org/dc/elements/1.1/title",
     "Ulo Uche", {"@context": "http://uche.ogbuji.net#_metadata",
                  "@lang": "ig"}),
]


def test_match_attrs():
    m = LocalModel(RELS_1)
    results = tuple(m.match(origin="http://uche.ogbuji.net",
                            attrs={"@lang": "ig"}))
    assert results == ((
        "http://uche.ogbuji.net", "http://purl.org/dc/elements/1.1/title",
        "Ulo Uche", {"@context": "http://uche.ogbuji.net#_metadata",
                     "@lang": "ig"}),)
    assert len(list(m.match(origin="http://copia.ogbuji.net"))) == 2


def test_ordered_insertion():
    m = LocalModel()
    m.add("s1", "p1", "lit1", {})
    m.add("s1", "p2", "lit2", {})
    m.add("s1", "p0", "lit0", {}, index=1)
    m.add("s2", "p3", "lit3", {})
    assert [q[1] for q in m] == ["p1", "p0", "p2", "p3"]


def test_removal():
    m = LocalModel()
    for i in range(4):
        m.add(f"s{1 if i < 3 else 2}", f"p{i}", f"lit{i}", {})
    m.remove([3, 0])
    assert [q[2] for q in m] == ["lit1", "lit2"]
    assert len(m) == 2
    m.remove(0)
    assert [q[2] for q in m] == ["lit2"]
    # removed links can be re-added (key set stays consistent)
    assert m.add("s1", "p1", "lit1", {}) is not None
    assert len(m) == 2


def test_index_access_and_add_return():
    m = LocalModel()
    r1 = m.add("s1", "p0", "lit0", {})
    r2 = m.add("s1", "p1", "lit1", {})
    r3 = m.add("s1", "p2", "lit2", {})
    assert m[r1][0] == "s1"
    assert m[r2][1] == "p1"
    assert m[r3][2] == "lit2"
    # duplicate refusal returns None (memory.py:179-181)
    assert m.add("s1", "p0", "lit0", {}) is None


def test_copy_and_update():
    m = LocalModel(RELS_1)
    m2 = m.copy()
    assert len(m2) == len(m) and list(m2) == list(m)
    m2.add("http://x.org/s", "http://x.org/p", "v")
    assert len(m2) == len(m) + 1          # copies are independent
    m.update(m2)
    assert len(m) == len(m2)              # union with dedup
