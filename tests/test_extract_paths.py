"""extract_unique_paths tests; oracles from the reference
tests/test_nodegraph.py:562-620."""

from khmer_tpu import Nodegraph


def test_extract_unique_paths_0():
    kh = Nodegraph(10, 1, 1, primes=[5, 7, 11, 13])
    x = kh.extract_unique_paths('ATGGAGAGACACAGATAGACAGGAGTGGCGATG',
                                10, 1)
    assert x == ['ATGGAGAGACACAGATAGACAGGAGTGGCGATG']
    kh.consume('ATGGAGAGACACAGATAGACAGGAGTGGCGATG')
    x = kh.extract_unique_paths('ATGGAGAGACACAGATAGACAGGAGTGGCGATG',
                                10, 1)
    assert not x


def test_extract_unique_paths_1():
    kh = Nodegraph(10, 1, 1, primes=[5, 7, 11, 13])
    kh.consume('AGTGGCGATG')
    x = kh.extract_unique_paths('ATGGAGAGACACAGATAGACAGGAGTGGCGATG',
                                10, 1)
    assert x == ['ATGGAGAGACACAGATAGACAGGAGTGGCGAT']


def test_extract_unique_paths_2():
    kh = Nodegraph(10, 1, 1, primes=[5, 7, 11, 13])
    kh.consume('ATGGAGAGAC')
    x = kh.extract_unique_paths('ATGGAGAGACACAGATAGACAGGAGTGGCGATG',
                                10, 1)
    assert x == ['TGGAGAGACACAGATAGACAGGAGTGGCGATG']


def test_extract_unique_paths_3():
    kh = Nodegraph(10, 1, 1, primes=[5, 7, 11, 13])
    kh.consume('ATGGAGAGAC')
    kh.consume('AGTGGCGATG')
    x = kh.extract_unique_paths('ATGGAGAGACACAGATAGACAGGAGTGGCGATG',
                                10, 1)
    assert x == ['TGGAGAGACACAGATAGACAGGAGTGGCGAT']


def test_extract_unique_paths_4():
    kh = Nodegraph(10, 1e6, 4)
    kh.consume('ATGGAGAGAC')
    kh.consume('AGTGGCGATG')
    kh.consume('ATAGACAGGA')
    x = kh.extract_unique_paths('ATGGAGAGACACAGATAGACAGGAGTGGCGATG',
                                10, 1)
    assert x == ['TGGAGAGACACAGATAGACAGG', 'TAGACAGGAGTGGCGAT']
