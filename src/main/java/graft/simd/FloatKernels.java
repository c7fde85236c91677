package graft.simd;

/**
 * Dispatch point for the float dot-product kernel used by the
 * approximate in-process tiers (HNSW beam traversal and neighbor
 * diversity). On a JVM with {@code jdk.incubator.vector} on the module
 * path (build.sbt adds {@code --add-modules jdk.incubator.vector} to
 * every forked run/test JVM) the SIMD kernel in {@link SimdDot} runs —
 * measured ~2.5x the scalar 8-accumulator kernel at dim=1024 on
 * AVX-512; without the module the scalar kernel is the fallback, so the
 * library loads everywhere.
 *
 * The static-final flag lets the JIT constant-fold the dispatch; the
 * SIMD class is referenced only behind the taken branch, so a JVM
 * without the module never attempts to link it.
 *
 * NOT for exact tiers: float-lane accumulation reorders the sum, so any
 * score that is EMITTED (rather than used to steer a search) must keep
 * the exact left-to-right double kernel that the fidelity contract pins.
 */
public final class FloatKernels {
  private static final boolean SIMD = detect();

  private static boolean detect() {
    try {
      Class.forName("jdk.incubator.vector.FloatVector", false,
          FloatKernels.class.getClassLoader());
      return true;
    } catch (Throwable t) {
      return false;
    }
  }

  /** Dot product of a[aOff..aOff+len) and b[bOff..bOff+len) as float
   *  accumulation widened to double at the end. */
  public static double dot(float[] a, int aOff, float[] b, int bOff, int len) {
    if (SIMD) return SimdDot.dot(a, aOff, b, bOff, len);
    return scalarDot(a, aOff, b, bOff, len);
  }

  // the previous hand-unrolled 8-accumulator kernel, kept as fallback
  static double scalarDot(float[] a, int aOff, float[] b, int bOff, int len) {
    float s0 = 0f, s1 = 0f, s2 = 0f, s3 = 0f, s4 = 0f, s5 = 0f, s6 = 0f, s7 = 0f;
    int i = 0;
    int lim = len - 7;
    while (i < lim) {
      s0 += a[aOff + i] * b[bOff + i];
      s1 += a[aOff + i + 1] * b[bOff + i + 1];
      s2 += a[aOff + i + 2] * b[bOff + i + 2];
      s3 += a[aOff + i + 3] * b[bOff + i + 3];
      s4 += a[aOff + i + 4] * b[bOff + i + 4];
      s5 += a[aOff + i + 5] * b[bOff + i + 5];
      s6 += a[aOff + i + 6] * b[bOff + i + 6];
      s7 += a[aOff + i + 7] * b[bOff + i + 7];
      i += 8;
    }
    float s = s0 + s1 + s2 + s3 + s4 + s5 + s6 + s7;
    while (i < len) {
      s += a[aOff + i] * b[bOff + i];
      i++;
    }
    return (double) s;
  }

  private FloatKernels() {}
}
