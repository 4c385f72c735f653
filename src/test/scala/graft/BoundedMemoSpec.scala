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

  test("size never exceeds the cap; evicted keys recompute") {
    val calls = new AtomicInteger(0)
    val memo = new BoundedMemo[Int, Integer](4)
    (0 until 10).foreach { i =>
      memo.getOrCompute(i, _ => { calls.incrementAndGet(); Integer.valueOf(i) })
      assert(memo.size <= 4, s"cap breached at insert $i: size=${memo.size}")
    }
    assert(calls.get() == 10) // all distinct keys computed once
    // key 9 survived the last reset window; key 0 was evicted
    memo.getOrCompute(9, _ => { calls.incrementAndGet(); Integer.valueOf(-1) })
    assert(calls.get() == 10, "live key recomputed")
    memo.getOrCompute(0, _ => { calls.incrementAndGet(); Integer.valueOf(0) })
    assert(calls.get() == 11, "evicted key should recompute")
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
