package graft.functions

/** Shared 64-bit hashing primitives for the byte-scan kernels
  * ([[DupGramStats]], [[TokenHashes]]): incremental FNV-1a constants and
  * the splitmix64 finalizer (FNV alone clusters on short inputs). One
  * definition so the kernels can't silently de-synchronize. */
private[functions] object FnvHash {
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  /** splitmix64 finalizer / avalanche. */
  @inline def avalanche(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
