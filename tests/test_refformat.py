"""Reference text-output parity (README.md "Output" section).

Golden facts from FIXTURES.md: trussMini degrees
{1:5, 2:4, 3:5, 4:7, 5:4, 6:6, 7:6, 8:5, 9:6, 10:6}; 4-truss = 18
edges, one component; triangles = 22.
"""

from __future__ import annotations

from linkgraph.graph.refformat import triangle_text, truss_text
from linkgraph.graph.triangles import triangles
from linkgraph.graph.truss import k_truss_components

DEG = {1: 5, 2: 4, 3: 5, 4: 7, 5: 4, 6: 6, 7: 6, 8: 5, 9: 6, 10: 6}


def test_truss_text_lines(spark, truss_mini):
    comp = k_truss_components(truss_mini, 4)
    lines = [r["value"] for r in truss_text(comp, truss_mini).collect()]
    assert len(lines) == 18
    for line in lines:
        comp_id, v1, d1, v2, d2 = map(int, line.split(" "))
        assert comp_id == 1
        assert DEG[v1] == d1 and DEG[v2] == d2
        # degree orientation: lower (degree, id) endpoint first
        assert (d1, v1) < (d2, v2)


def test_triangle_text_lines(spark, truss_mini):
    tri = triangles(truss_mini)
    lines = [r["value"] for r in triangle_text(tri, truss_mini).collect()]
    assert len(lines) == 22
    for line in lines:
        nums = list(map(int, line.split(" ")))
        assert len(nums) == 12
        edges = [(nums[i], nums[i + 1], nums[i + 2], nums[i + 3]) for i in (0, 4, 8)]
        verts = set()
        for v1, d1, v2, d2 in edges:
            assert DEG[v1] == d1 and DEG[v2] == d2
            assert (d1, v1) < (d2, v2)
            verts |= {v1, v2}
        assert len(verts) == 3  # the three edges close a triangle
