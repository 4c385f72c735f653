package graft

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BoundedMemo

class BoundedMemoSpec extends AnyFunSuite {

  test("hits return the cached instance without recompute") {
    val calls = new AtomicInteger(0)
    val memo = new BoundedMemo[Int, Integer](8)
    val a = memo.getOrCompute(1, _ => { calls.incrementAndGet(); Integer.valueOf(11) })
    val b = memo.getOrCompute(1, _ => { calls.incrementAndGet(); Integer.valueOf(99) })
    assert(a eq b)
    assert(calls.get() == 1)
  }

  test("size never exceeds the cap; evicted keys recompute, live keys don't") {
    val calls = new AtomicInteger(0)
    val memo = new BoundedMemo[Int, Integer](4)
    (0 until 10).foreach { i =>
      memo.getOrCompute(i, _ => { calls.incrementAndGet(); Integer.valueOf(i) })
      assert(memo.size <= 4, s"cap breached at insert $i: size=${memo.size}")
    }
    assert(calls.get() == 10) // all distinct keys computed once
    // exactly at the cap no reset happens: fill a fresh memo to 4 —
    // all four stay live, the 5th insert resets wholesale
    val calls2 = new AtomicInteger(0)
    val memo2 = new BoundedMemo[Int, Integer](4)
    (0 until 4).foreach(i => memo2.getOrCompute(i, _ => { calls2.incrementAndGet(); Integer.valueOf(i) }))
    (0 until 4).foreach(i => memo2.getOrCompute(i, _ => { calls2.incrementAndGet(); Integer.valueOf(-i) }))
    assert(calls2.get() == 4, "keys at-cap should all be live hits")
    memo2.getOrCompute(4, _ => { calls2.incrementAndGet(); Integer.valueOf(4) })
    assert(memo2.size <= 4)
    memo2.getOrCompute(0, _ => { calls2.incrementAndGet(); Integer.valueOf(0) })
    assert(calls2.get() == 6, "evicted key should recompute")
  }

  test("concurrent access stays within the cap and returns correct values") {
    val memo = new BoundedMemo[Int, Integer](8)
    val threads = (0 until 8).map { t =>
      new Thread(() => (0 until 1000).foreach { i =>
        val k = (t * 31 + i) % 50
        assert(memo.getOrCompute(k, key => Integer.valueOf(key * 2)) == k * 2)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(memo.size <= 8)
  }
}
