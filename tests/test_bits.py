import numpy as np
import jax.numpy as jnp

from annealing_sign_problem_tpu import bits


def test_pack_unpack_roundtrip(rng):
    spins = rng.randint(0, 1 << 16, size=100).astype(np.uint64)
    unpacked = bits.unpack(jnp.asarray(spins), 16)
    assert unpacked.shape == (100, 16)
    assert set(np.unique(np.asarray(unpacked))) <= {-1.0, 1.0}
    repacked = np.asarray(bits.pack(unpacked))
    np.testing.assert_array_equal(repacked, spins)


def test_unpack_matches_bit_arithmetic():
    spins = np.array([0b1011], dtype=np.uint64)
    u = np.asarray(bits.unpack(jnp.asarray(spins), 4))[0]
    np.testing.assert_array_equal(u, [1.0, 1.0, -1.0, 1.0])


def test_signs_bits_roundtrip(rng):
    for n in [1, 63, 64, 65, 130]:
        signs = 2.0 * rng.randint(0, 2, size=n) - 1.0
        packed = bits.signs_to_bits(signs)
        assert packed.shape == ((n + 63) // 64,)
        recovered = bits.bits_to_signs(packed, n)
        np.testing.assert_array_equal(recovered, signs)


def test_signs_to_bits_convention():
    # bit set <=> sign positive (cbits/build_matrix.c:67-76)
    packed = bits.signs_to_bits(np.array([1.0, -1.0, 1.0]))
    assert packed[0] == 0b101


def test_popcount(rng):
    x = rng.randint(0, 1 << 62, size=50).astype(np.uint64)
    expected = np.array([bin(int(v)).count("1") for v in x])
    np.testing.assert_array_equal(np.asarray(bits.popcount(jnp.asarray(x))), expected)


def test_spins_to_array_bits512_layout():
    x = np.zeros((3, 8), dtype=np.uint64)
    x[:, 0] = [5, 7, 9]
    np.testing.assert_array_equal(bits.spins_to_array(x), [5, 7, 9])
