// 2-bit ripple-carry adder, HELM processed-netlist format (gates mode).
// Recreated from the format contract (reference README.md:70-104 and
// tests/circuit_test.rs:18-45: 10 gates, 5 inputs, 15 wires).
module adder(a, b, cin, sum, cout);
  input [1:0] a;
  input [1:0] b;
  input cin;
  output [1:0] sum;
  output cout;
  wire xab0, aab0, ac0, c1, xab1, aab1, ac1;

  xor g0(a[0], b[0], xab0);
  xor g1(xab0, cin, sum[0]);
  and g2(a[0], b[0], aab0);
  and g3(cin, xab0, ac0);
  or g4(aab0, ac0, c1);
  xor g5(a[1], b[1], xab1);
  xor g6(xab1, c1, sum[1]);
  and g7(a[1], b[1], aab1);
  and g8(c1, xab1, ac1);
  or g9(aab1, ac1, cout);
endmodule
