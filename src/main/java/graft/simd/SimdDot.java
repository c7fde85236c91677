package graft.simd;

import jdk.incubator.vector.FloatVector;
import jdk.incubator.vector.VectorOperators;
import jdk.incubator.vector.VectorSpecies;

/**
 * Vector-API float dot kernel. Loaded ONLY when {@link FloatKernels}
 * detected {@code jdk.incubator.vector} at runtime (the build forks run
 * and test JVMs with {@code --add-modules jdk.incubator.vector}); callers
 * go through {@link FloatKernels#dot}, never here directly, so a JVM
 * without the module never links this class.
 *
 * Accumulation is 4 independent vector lanes folded pairwise, then a
 * lane reduction — a DIFFERENT float summation order than the scalar
 * 8-lane kernel it replaces. That is fine where it is used: these dots
 * steer approximate search (HNSW beam traversal, neighbor diversity),
 * and every emitted (id, score) is re-scored with the exact
 * left-to-right double kernel before it leaves the index.
 */
public final class SimdDot {
  private static final VectorSpecies<Float> SP = FloatVector.SPECIES_PREFERRED;
  private static final int L = SP.length();

  static double dot(float[] a, int aOff, float[] b, int bOff, int len) {
    FloatVector a0 = FloatVector.zero(SP);
    FloatVector a1 = FloatVector.zero(SP);
    FloatVector a2 = FloatVector.zero(SP);
    FloatVector a3 = FloatVector.zero(SP);
    int i = 0;
    int lim = len - 4 * L + 1;
    while (i < lim) {
      a0 = FloatVector.fromArray(SP, a, aOff + i)
          .fma(FloatVector.fromArray(SP, b, bOff + i), a0);
      a1 = FloatVector.fromArray(SP, a, aOff + i + L)
          .fma(FloatVector.fromArray(SP, b, bOff + i + L), a1);
      a2 = FloatVector.fromArray(SP, a, aOff + i + 2 * L)
          .fma(FloatVector.fromArray(SP, b, bOff + i + 2 * L), a2);
      a3 = FloatVector.fromArray(SP, a, aOff + i + 3 * L)
          .fma(FloatVector.fromArray(SP, b, bOff + i + 3 * L), a3);
      i += 4 * L;
    }
    int lim1 = len - L + 1;
    while (i < lim1) {
      a0 = FloatVector.fromArray(SP, a, aOff + i)
          .fma(FloatVector.fromArray(SP, b, bOff + i), a0);
      i += L;
    }
    float s = a0.add(a1).add(a2.add(a3)).reduceLanes(VectorOperators.ADD);
    while (i < len) {
      s += a[aOff + i] * b[bOff + i];
      i++;
    }
    return (double) s;
  }

  private SimdDot() {}
}
