// SPDX-License-Identifier: MIT
pragma solidity ^0.8.25;

import {VectorX} from "../src/VectorX.sol";

/// @notice Deploy script (forge): reads genesis parameters from env —
///         produced by `python -m vectorx_tpu.bin.genesis` — mirroring the
///         reference env-driven deploy (reference contracts/script/
///         Deploy.s.sol:12-81, minus proxy/timelock plumbing).
/// Env: GUARDIAN_ADDRESS, GATEWAY_ADDRESS, GENESIS_HEIGHT, GENESIS_HEADER,
///      GENESIS_AUTHORITY_SET_ID, GENESIS_AUTHORITY_SET_HASH,
///      HEADER_RANGE_FUNCTION_ID, ROTATE_FUNCTION_ID,
///      HEADER_RANGE_COMMITMENT_TREE_SIZE.
interface Vm {
    function envAddress(string calldata) external returns (address);
    function envUint(string calldata) external returns (uint256);
    function envBytes32(string calldata) external returns (bytes32);
    function startBroadcast() external;
    function stopBroadcast() external;
}

contract Deploy {
    Vm constant vm = Vm(address(uint160(uint256(keccak256("hevm cheat code")))));

    function run() external returns (VectorX vectorx) {
        VectorX.InitParameters memory p = VectorX.InitParameters({
            guardian: vm.envAddress("GUARDIAN_ADDRESS"),
            gateway: vm.envAddress("GATEWAY_ADDRESS"),
            height: uint32(vm.envUint("GENESIS_HEIGHT")),
            header: vm.envBytes32("GENESIS_HEADER"),
            authoritySetId: uint64(vm.envUint("GENESIS_AUTHORITY_SET_ID")),
            authoritySetHash: vm.envBytes32("GENESIS_AUTHORITY_SET_HASH"),
            headerRangeFunctionId: vm.envBytes32("HEADER_RANGE_FUNCTION_ID"),
            rotateFunctionId: vm.envBytes32("ROTATE_FUNCTION_ID"),
            headerRangeCommitmentTreeSize: uint32(
                vm.envUint("HEADER_RANGE_COMMITMENT_TREE_SIZE")
            )
        });
        vm.startBroadcast();
        vectorx = new VectorX(p);
        vm.stopBroadcast();
    }
}
