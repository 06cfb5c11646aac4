"""Reference golden vectors for span/phrase/boolean queries.

Expected hit doc-id sets transcribed from the reference's own span test
suite (``reference lucene/core/src/test/org/apache/lucene/search/spans/
TestBasics.java:87-432`` checkHits literals) over its deterministic
corpus: doc i = English.intToEnglish(i) for i in 0..1999 (``reference
lucene/test-framework/src/java/org/apache/lucene/util/English.java``),
tokenized letters-only + lowercase (MockTokenizer.SIMPLE).  The contract
oracles for the ft_golden_* rows are built from THESE literals only —
the engine never reads them, so a pass means the Spark engine reproduces
the reference's documented hits, not a builder re-derivation.
"""

from __future__ import annotations


def int_to_english(i: int) -> str:
    """Faithful re-implementation of the reference test fixture generator
    ``English.longToEnglish`` (English.java:34-173) for 0 <= i < 10^6 —
    the corpus generator behind the TestBasics golden vectors."""
    if i == 0:
        return "zero"
    out = []
    if i >= 1000:
        out.append(int_to_english(i // 1000).rstrip() + " thousand, ")
        i %= 1000
    if i >= 100:
        out.append(int_to_english(i // 100).rstrip() + " hundred ")
        i %= 100
    tens = {9: "ninety", 8: "eighty", 7: "seventy", 6: "sixty", 5: "fifty",
            4: "forty", 3: "thirty", 2: "twenty"}
    if i >= 20:
        out.append(tens[i // 10])
        i %= 10
        out.append(" " if i == 0 else "-")
    ones = ["", "one ", "two ", "three ", "four ", "five ", "six ",
            "seven ", "eight ", "nine ", "ten ", "eleven ", "twelve ",
            "thirteen ", "fourteen ", "fifteen ", "sixteen ",
            "seventeen ", "eighteen ", "nineteen "]
    out.append(ones[i])
    return "".join(out)


# case -> sorted expected hit doc ids (TestBasics.java checkHits literals)
GOLDEN_HITS = {
    "term_seventy": [
        70, 71, 72, 73, 74, 75, 76, 77, 78, 79, 170, 171, 172, 173, 174,
        175, 176, 177, 178, 179, 270, 271, 272, 273, 274, 275, 276, 277,
        278, 279, 370, 371, 372, 373, 374, 375, 376, 377, 378, 379, 470,
        471, 472, 473, 474, 475, 476, 477, 478, 479, 570, 571, 572, 573,
        574, 575, 576, 577, 578, 579, 670, 671, 672, 673, 674, 675, 676,
        677, 678, 679, 770, 771, 772, 773, 774, 775, 776, 777, 778, 779,
        870, 871, 872, 873, 874, 875, 876, 877, 878, 879, 970, 971, 972,
        973, 974, 975, 976, 977, 978, 979, 1070, 1071, 1072, 1073, 1074,
        1075, 1076, 1077, 1078, 1079, 1170, 1171, 1172, 1173, 1174,
        1175, 1176, 1177, 1178, 1179, 1270, 1271, 1272, 1273, 1274,
        1275, 1276, 1277, 1278, 1279, 1370, 1371, 1372, 1373, 1374,
        1375, 1376, 1377, 1378, 1379, 1470, 1471, 1472, 1473, 1474,
        1475, 1476, 1477, 1478, 1479, 1570, 1571, 1572, 1573, 1574,
        1575, 1576, 1577, 1578, 1579, 1670, 1671, 1672, 1673, 1674,
        1675, 1676, 1677, 1678, 1679, 1770, 1771, 1772, 1773, 1774,
        1775, 1776, 1777, 1778, 1779, 1870, 1871, 1872, 1873, 1874,
        1875, 1876, 1877, 1878, 1879, 1970, 1971, 1972, 1973, 1974,
        1975, 1976, 1977, 1978, 1979
    ],
    "phrase_seventy_seven": [
        77, 177, 277, 377, 477, 577, 677, 777, 877, 977, 1077, 1177,
        1277, 1377, 1477, 1577, 1677, 1777, 1877, 1977
    ],
    "bool_seventy_seven": [
        77, 177, 277, 377, 477, 577, 677, 770, 771, 772, 773, 774, 775,
        776, 777, 778, 779, 877, 977, 1077, 1177, 1277, 1377, 1477,
        1577, 1677, 1770, 1771, 1772, 1773, 1774, 1775, 1776, 1777,
        1778, 1779, 1877, 1977
    ],
    "near_exact_seventy_seven": [
        77, 177, 277, 377, 477, 577, 677, 777, 877, 977, 1077, 1177,
        1277, 1377, 1477, 1577, 1677, 1777, 1877, 1977
    ],
    "near_unordered_nine_six": [
        609, 629, 639, 649, 659, 669, 679, 689, 699, 906, 926, 936, 946,
        956, 966, 976, 986, 996, 1609, 1629, 1639, 1649, 1659, 1669,
        1679, 1689, 1699, 1906, 1926, 1936, 1946, 1956, 1966, 1976,
        1986, 1996
    ],
    "near_ordered_nine_six": [
        906, 926, 936, 946, 956, 966, 976, 986, 996, 1906, 1926, 1936,
        1946, 1956, 1966, 1976, 1986, 1996
    ],
    "first_five_1": [
        5, 500, 501, 502, 503, 504, 505, 506, 507, 508, 509, 510, 511,
        512, 513, 514, 515, 516, 517, 518, 519, 520, 521, 522, 523, 524,
        525, 526, 527, 528, 529, 530, 531, 532, 533, 534, 535, 536, 537,
        538, 539, 540, 541, 542, 543, 544, 545, 546, 547, 548, 549, 550,
        551, 552, 553, 554, 555, 556, 557, 558, 559, 560, 561, 562, 563,
        564, 565, 566, 567, 568, 569, 570, 571, 572, 573, 574, 575, 576,
        577, 578, 579, 580, 581, 582, 583, 584, 585, 586, 587, 588, 589,
        590, 591, 592, 593, 594, 595, 596, 597, 598, 599
    ],
    "posrange_five_1_2": [
        25, 35, 45, 55, 65, 75, 85, 95
    ],
    "posrange_five_0_1": [
        5, 500, 501, 502, 503, 504, 505, 506, 507, 508, 509, 510, 511,
        512, 513, 514, 515, 516, 517, 518, 519, 520, 521, 522, 523, 524,
        525, 526, 527, 528, 529, 530, 531, 532, 533, 534, 535, 536, 537,
        538, 539, 540, 541, 542, 543, 544, 545, 546, 547, 548, 549, 550,
        551, 552, 553, 554, 555, 556, 557, 558, 559, 560, 561, 562, 563,
        564, 565, 566, 567, 568, 569, 570, 571, 572, 573, 574, 575, 576,
        577, 578, 579, 580, 581, 582, 583, 584, 585, 586, 587, 588, 589,
        590, 591, 592, 593, 594, 595, 596, 597, 598, 599
    ],
    "or_thirtythree_fortyseven": [
        33, 47, 133, 147, 233, 247, 333, 347, 433, 447, 533, 547, 633,
        647, 733, 747, 833, 847, 933, 947, 1033, 1047, 1133, 1147, 1233,
        1247, 1333, 1347, 1433, 1447, 1533, 1547, 1633, 1647, 1733,
        1747, 1833, 1847, 1933, 1947
    ],
    "nested_three_hundred_thirty_three": [
        333, 1333
    ],
    "near_or_six_seven": [
        606, 607, 626, 627, 636, 637, 646, 647, 656, 657, 666, 667, 676,
        677, 686, 687, 696, 697, 706, 707, 726, 727, 736, 737, 746, 747,
        756, 757, 766, 767, 776, 777, 786, 787, 796, 797, 1606, 1607,
        1626, 1627, 1636, 1637, 1646, 1647, 1656, 1657, 1666, 1667,
        1676, 1677, 1686, 1687, 1696, 1697, 1706, 1707, 1726, 1727,
        1736, 1737, 1746, 1747, 1756, 1757, 1766, 1767, 1776, 1777,
        1786, 1787, 1796, 1797
    ],
}



# case -> [(doc_id, start, end)] minimal-interval literals from the
# reference interval test suite (``reference lucene/sandbox/src/test/
# org/apache/lucene/search/intervals/TestIntervals.java:176-330``
# checkIntervals arrays over its fixed 6-doc pease-porridge corpus)
GOLDEN_INTERVALS = {
    "term_porridge": [
        (1, 1, 1), (1, 4, 4), (1, 7, 7), (2, 1, 1), (2, 4, 4), (2, 7,
        7), (4, 1, 1), (4, 4, 4), (4, 7, 7), (5, 0, 0)
    ],
    "ordered_pease_hot": [
        (1, 0, 2), (1, 6, 17), (2, 3, 5), (2, 6, 21), (4, 0, 2), (4, 6,
        17)
    ],
    "phrase_pease_porridge": [
        (1, 0, 1), (1, 3, 4), (1, 6, 7), (2, 0, 1), (2, 3, 4), (2, 6,
        7), (4, 0, 1), (4, 3, 4), (4, 6, 7)
    ],
    "unordered_pease_hot": [
        (1, 0, 2), (1, 2, 3), (1, 6, 17), (2, 3, 5), (2, 5, 6), (2, 6,
        21), (3, 3, 7), (4, 0, 2), (4, 2, 3), (4, 6, 17)
    ],
    "or_pease_hot_notmatching": [
        (1, 0, 0), (1, 2, 2), (1, 3, 3), (1, 6, 6), (1, 17, 17), (2, 0,
        0), (2, 3, 3), (2, 5, 5), (2, 6, 6), (2, 21, 21), (3, 3, 3), (3,
        7, 7), (4, 0, 0), (4, 2, 2), (4, 3, 3), (4, 6, 6), (4, 17, 17)
    ],
    "nested_unordered_or": [
        (1, 0, 2), (1, 1, 3), (1, 2, 4), (1, 3, 5), (1, 4, 6), (1, 5,
        7), (1, 6, 17), (2, 0, 2), (2, 1, 3), (2, 2, 4), (2, 3, 5), (2,
        4, 6), (2, 5, 7), (2, 6, 17), (4, 0, 2), (4, 1, 3), (4, 2, 4),
        (4, 3, 5), (4, 4, 6), (4, 5, 7), (4, 6, 17)
    ],
    "combo_disjunction_f2": [
        (1, 3, 8)
    ],
}

# the reference corpus itself (TestIntervals.java:50-68), verbatim
INTERVALS_FIELD1 = [
    'Nothing of interest to anyone here',
    'Pease porridge hot, pease porridge cold, pease porridge in the pot nine days old.  Some like it hot, some like it cold, some like it in the pot nine days old',
    'Pease porridge cold, pease porridge hot, pease porridge in the pot twelve days old.  Some like it cold, some like it hot, some like it in the fraggle',
    'Nor here, nowt hot going on in pease this one',
    'Pease porridge hot, pease porridge cold, pease porridge in the pot nine years old.  Some like it hot, some like it twelve',
    'Porridge is great',
]
INTERVALS_FIELD2 = [
    'In Xanadu did Kubla Khan a stately pleasure dome decree',
    'Where Alph the sacred river ran through caverns measureless to man',
    'Down to a sunless sea',
    'So thrice five miles of fertile ground',
    'Pease hot porridge porridge',
    'w1 w2 w3 w4 w1 w6 w3 w8 w4 w7 w1 w6',
]


# case -> sorted expected hit doc ids for the SpanNot family
# (TestBasics.java:189-333 checkHits literals)
GOLDEN_SPAN_NOT = {
    "not_eight_one_forty": [
        801, 821, 831, 851, 861, 871, 881, 891, 1801, 1821, 1831, 1851,
        1861, 1871, 1881, 1891
    ],
    "not_large_window": [
        801, 821, 831, 851, 861, 871, 881, 891, 1801, 1821, 1831, 1851,
        1861, 1871, 1881, 1891
    ],
    "not_multiple_many": [
        801, 821, 831, 851, 871, 891, 1801, 1821, 1831, 1851, 1871, 1891
    ],
    "not_near_exclude": [
        801, 821, 831, 851, 861, 871, 881, 891, 1801, 1821, 1831, 1851,
        1861, 1871, 1881, 1891
    ],
    "not_first_nested": [
        40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 1040, 1041, 1042, 1043,
        1044, 1045, 1046, 1047, 1048, 1049, 1140, 1141, 1142, 1143,
        1144, 1145, 1146, 1147, 1148, 1149, 1240, 1241, 1242, 1243,
        1244, 1245, 1246, 1247, 1248, 1249, 1340, 1341, 1342, 1343,
        1344, 1345, 1346, 1347, 1348, 1349, 1440, 1441, 1442, 1443,
        1444, 1445, 1446, 1447, 1448, 1449, 1540, 1541, 1542, 1543,
        1544, 1545, 1546, 1547, 1548, 1549, 1640, 1641, 1642, 1643,
        1644, 1645, 1646, 1647, 1648, 1649, 1740, 1741, 1742, 1743,
        1744, 1745, 1746, 1747, 1748, 1749, 1840, 1841, 1842, 1843,
        1844, 1845, 1846, 1847, 1848, 1849, 1940, 1941, 1942, 1943,
        1944, 1945, 1946, 1947, 1948, 1949
    ],
    "not_window_one": [
        840, 842, 843, 844, 845, 846, 847, 848, 849, 1840, 1842, 1843,
        1844, 1845, 1846, 1847, 1848, 1849
    ],
    "not_window_two_before": [
        840, 841, 842, 843, 844, 845, 846, 847, 848, 849
    ],
    "not_window_neg_post2": [
        801, 821, 831, 841, 851, 861, 871, 881, 891, 1801, 1821, 1831,
        1841, 1851, 1861, 1871, 1881, 1891
    ],
    "not_window_neg_pre3": [
        801, 821, 831, 841, 851, 861, 871, 881, 891, 1801, 1821, 1831,
        1841, 1851, 1861, 1871, 1881, 1891
    ],
    "not_double_excludes": [
        42, 242, 342, 442, 542, 642, 742, 842, 942
    ],
}


# TestBasics.java:416-431 testSpanComplex1: ordered near(100) of an
# or-of-nears clause and an or-of-terms clause
GOLDEN_HITS["complex1_six_seven_hundred"] = [
    606, 607, 626, 627, 636, 637, 646, 647, 656, 657, 666, 667, 676,
    677, 686, 687, 696, 697, 706, 707, 726, 727, 736, 737, 746, 747,
    756, 757, 766, 767, 776, 777, 786, 787, 796, 797, 1606, 1607, 1626,
    1627, 1636, 1637, 1646, 1647, 1656, 1657, 1666, 1667, 1676, 1677,
    1686, 1687, 1696, 1697, 1706, 1707, 1726, 1727, 1736, 1737, 1746,
    1747, 1756, 1757, 1766, 1767, 1776, 1777, 1786, 1787, 1796, 1797
]
